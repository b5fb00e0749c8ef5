"""Multi-device tests on the virtual 8-device CPU mesh.

The reference has NO distributed tests at all (SURVEY.md §4: sp_utils.py is
untested). Here every parallel path is validated against the single-device
oracle on a real (virtual) mesh via shard_map.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P


from sink_attention_tpu.ops import eager_sink_attention, sink_flash_attention
from sink_attention_tpu.parallel import (
    broadcast_sink_kv,
    make_mesh,
    ring_sink_flash_attention,
    sp_sink_flash_attention,
    ulysses_sink_flash_attention,
)

pytestmark = pytest.mark.skipif(
    jax.device_count() < 4, reason="needs >= 4 devices (virtual CPU mesh)")


def make_qkv(key, B, H_q, H_kv, N, D):
    ks = jax.random.split(key, 3)
    return (jax.random.normal(ks[0], (B, H_q, N, D)),
            jax.random.normal(ks[1], (B, H_kv, N, D)),
            jax.random.normal(ks[2], (B, H_kv, N, D)))


def seq_mesh(n):
    return make_mesh({"seq": n}, devices=jax.devices()[:n])


def test_broadcast_sink_kv():
    mesh = seq_mesh(4)
    B, H, N, D = 1, 2, 64, 8
    k = jnp.arange(B * H * N * D, dtype=jnp.float32).reshape(B, H, N, D)
    v = k + 0.5

    out_k, out_v = jax.jit(jax.shard_map(
        lambda k, v: broadcast_sink_kv(k, v, 4, "seq"),
        mesh=mesh, in_specs=(P(None, None, "seq", None),) * 2,
        out_specs=P(None, None, None, "seq"), check_vma=False))(k, v)
    # every shard must hold shard 0's first 4 positions -> concat over the
    # out axis gives 4 copies
    expect = np.asarray(k[:, :, :4])
    got = np.asarray(out_k).reshape(B, H, 4, 4, D)
    for i in range(4):
        np.testing.assert_array_equal(got[:, :, :, i], expect)


@pytest.mark.parametrize("num_sink,window", [(4, 128), (0, 128), (16, 192)])
def test_sp_matches_single_device(num_sink, window):
    n_dev = 4
    mesh = seq_mesh(n_dev)
    B, H_q, H_kv, N, D = 1, 4, 2, 1024, 64
    q, k, v = make_qkv(jax.random.PRNGKey(0), B, H_q, H_kv, N, D)
    s_aux = jax.random.normal(jax.random.PRNGKey(1), (H_q,))

    out = jax.jit(jax.shard_map(
        lambda q, k, v: sp_sink_flash_attention(
            q, k, v, num_sink=num_sink, window_size=window, s_aux=s_aux,
            axis_name="seq"),
        mesh=mesh, in_specs=(P(None, None, "seq", None),) * 3,
        out_specs=P(None, None, "seq", None), check_vma=False))(q, k, v)

    ref = eager_sink_attention(q, k, v, num_sink=num_sink,
                               window_size=window, s_aux=s_aux)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4,
                               rtol=1e-3)


def test_ulysses_matches_single_device():
    n_dev = 2
    mesh = seq_mesh(n_dev)
    B, H_q, H_kv, N, D = 1, 4, 2, 512, 64
    q, k, v = make_qkv(jax.random.PRNGKey(2), B, H_q, H_kv, N, D)
    s_aux = jax.random.normal(jax.random.PRNGKey(3), (H_q,))

    out = jax.jit(jax.shard_map(
        lambda q, k, v: ulysses_sink_flash_attention(
            q, k, v, num_sink=4, window_size=128, s_aux=s_aux,
            axis_name="seq"),
        mesh=mesh, in_specs=(P(None, None, "seq", None),) * 3,
        out_specs=P(None, None, "seq", None), check_vma=False))(q, k, v)

    ref = eager_sink_attention(q, k, v, num_sink=4, window_size=128,
                               s_aux=s_aux)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4,
                               rtol=1e-3)


def test_ulysses_gradients():
    """Ulysses SP is the differentiable SP path — grads must match the
    single-device kernel's grads."""
    n_dev = 2
    mesh = seq_mesh(n_dev)
    B, H_q, H_kv, N, D = 1, 4, 2, 256, 64
    q, k, v = make_qkv(jax.random.PRNGKey(4), B, H_q, H_kv, N, D)
    s_aux = jax.random.normal(jax.random.PRNGKey(5), (H_q,))

    sp_fn = jax.shard_map(
        lambda q, k, v, aux: ulysses_sink_flash_attention(
            q, k, v, num_sink=4, window_size=64, s_aux=aux,
            axis_name="seq"),
        mesh=mesh,
        in_specs=(P(None, None, "seq", None),) * 3 + (P(),),
        out_specs=P(None, None, "seq", None), check_vma=False)

    def loss_sp(q, k, v, aux):
        return jnp.sum(sp_fn(q, k, v, aux) ** 2)

    def loss_ref(q, k, v, aux):
        return jnp.sum(sink_flash_attention(
            q, k, v, num_sink=4, window_size=64, s_aux=aux) ** 2)

    g_sp = jax.jit(jax.grad(loss_sp, (0, 1, 2, 3)))(q, k, v, s_aux)
    g_ref = jax.grad(loss_ref, (0, 1, 2, 3))(q, k, v, s_aux)
    for name, a, b in zip("q k v aux".split(), g_sp, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4,
                                   rtol=1e-3, err_msg=name)


@pytest.mark.parametrize("num_sink,window", [(4, 96), (4, 4096), (0, 256)])
def test_ring_matches_single_device(num_sink, window):
    n_dev = 4
    mesh = seq_mesh(n_dev)
    B, H_q, H_kv, N, D = 1, 4, 2, 1024, 64
    q, k, v = make_qkv(jax.random.PRNGKey(6), B, H_q, H_kv, N, D)
    s_aux = jax.random.normal(jax.random.PRNGKey(7), (H_q,))

    out = jax.jit(jax.shard_map(
        lambda q, k, v: ring_sink_flash_attention(
            q, k, v, num_sink=num_sink, window_size=window, s_aux=s_aux,
            axis_name="seq"),
        mesh=mesh, in_specs=(P(None, None, "seq", None),) * 3,
        out_specs=P(None, None, "seq", None), check_vma=False))(q, k, v)

    ref = eager_sink_attention(q, k, v, num_sink=num_sink,
                               window_size=window, s_aux=s_aux)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4,
                               rtol=1e-3)


def test_ring_window_spans_many_shards():
    """window larger than a shard: ring must still be exact (this is the
    case halo-SP cannot handle)."""
    n_dev = 8
    mesh = seq_mesh(8)
    B, H, N, D = 1, 2, 1024, 64
    q, k, v = make_qkv(jax.random.PRNGKey(8), B, H, H, N, D)
    out = jax.jit(jax.shard_map(
        lambda q, k, v: ring_sink_flash_attention(
            q, k, v, num_sink=4, window_size=512, axis_name="seq"),
        mesh=mesh, in_specs=(P(None, None, "seq", None),) * 3,
        out_specs=P(None, None, "seq", None), check_vma=False))(q, k, v)
    ref = eager_sink_attention(q, k, v, num_sink=4, window_size=512)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4,
                               rtol=1e-3)


def test_ring_gradients():
    """Chunked-kernel VJP (lse cotangent folded into delta) makes ring
    attention trainable — grads must match the single-device kernel."""
    n_dev = 2
    mesh = seq_mesh(n_dev)
    B, H_q, H_kv, N, D = 1, 4, 2, 256, 64
    q, k, v = make_qkv(jax.random.PRNGKey(8), B, H_q, H_kv, N, D)
    s_aux = jax.random.normal(jax.random.PRNGKey(9), (H_q,))

    ring_fn = jax.shard_map(
        lambda q, k, v, aux: ring_sink_flash_attention(
            q, k, v, num_sink=4, window_size=96, s_aux=aux,
            axis_name="seq"),
        mesh=mesh,
        in_specs=(P(None, None, "seq", None),) * 3 + (P(),),
        out_specs=P(None, None, "seq", None), check_vma=False)

    def loss_ring(q, k, v, aux):
        return jnp.sum(ring_fn(q, k, v, aux) ** 2)

    def loss_ref(q, k, v, aux):
        return jnp.sum(sink_flash_attention(
            q, k, v, num_sink=4, window_size=96, s_aux=aux) ** 2)

    g_sp = jax.jit(jax.grad(loss_ring, (0, 1, 2, 3)))(q, k, v, s_aux)
    g_ref = jax.grad(loss_ref, (0, 1, 2, 3))(q, k, v, s_aux)
    for name, a, b in zip("q k v aux".split(), g_sp, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4,
                                   rtol=1e-3, err_msg=name)


def test_sp_gradients():
    """Halo-SP attention grads: the sink-KV grad reduction happens through
    the psum-broadcast transpose (reference does it by hand with
    dist.all_reduce — sp_utils.py:81-129)."""
    n_dev = 4
    mesh = seq_mesh(n_dev)
    B, H_q, H_kv, N, D = 1, 4, 2, 512, 64
    q, k, v = make_qkv(jax.random.PRNGKey(10), B, H_q, H_kv, N, D)
    s_aux = jax.random.normal(jax.random.PRNGKey(11), (H_q,))

    sp_fn = jax.shard_map(
        lambda q, k, v, aux: sp_sink_flash_attention(
            q, k, v, num_sink=4, window_size=64, s_aux=aux,
            axis_name="seq"),
        mesh=mesh,
        in_specs=(P(None, None, "seq", None),) * 3 + (P(),),
        out_specs=P(None, None, "seq", None), check_vma=False)

    def loss_sp(q, k, v, aux):
        return jnp.sum(sp_fn(q, k, v, aux) ** 2)

    def loss_ref(q, k, v, aux):
        return jnp.sum(sink_flash_attention(
            q, k, v, num_sink=4, window_size=64, s_aux=aux) ** 2)

    g_sp = jax.jit(jax.grad(loss_sp, (0, 1, 2, 3)))(q, k, v, s_aux)
    g_ref = jax.grad(loss_ref, (0, 1, 2, 3))(q, k, v, s_aux)
    for name, a, b in zip("q k v aux".split(), g_sp, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4,
                                   rtol=1e-3, err_msg=name)


def test_packed_cross_entropy_matches_per_segment():
    """Packed CE (packed kernel + masked targets) must equal the
    token-weighted CE of separate per-segment forwards."""
    from sink_attention_tpu.models import ModelConfig, init_params
    from sink_attention_tpu.models.model import forward_prefill
    from sink_attention_tpu.parallel.train import (cross_entropy_loss,
                                                   cross_entropy_loss_packed)

    cfg = ModelConfig.tiny(num_layers=2, vocab_size=64, sliding_window=16)
    params = init_params(cfg, jax.random.PRNGKey(20), jnp.float32)
    segs = [24, 40]
    N = sum(segs)
    ids = jax.random.randint(jax.random.PRNGKey(21), (1, N), 0, 64)
    pos = jnp.concatenate(
        [jnp.arange(L, dtype=jnp.int32) for L in segs])[None]

    packed = float(cross_entropy_loss_packed(params, cfg, ids, pos))

    # reference: per-segment losses weighted by their target counts
    total_ll, total_n = 0.0, 0
    off = 0
    for L in segs:
        seg = ids[:, off:off + L]
        logits, _ = forward_prefill(params, cfg, seg)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
        tgt = seg[:, 1:]
        ll = jnp.take_along_axis(logp[:, :-1], tgt[..., None], -1)
        total_ll += float(ll.sum())
        total_n += L - 1
        off += L
    ref = -total_ll / total_n
    np.testing.assert_allclose(packed, ref, rtol=1e-5, atol=1e-6)

    # gradient flows and is finite
    g = jax.grad(lambda p: cross_entropy_loss_packed(p, cfg, ids, pos))(
        params)
    flat = jax.tree.leaves(g)
    assert all(bool(jnp.all(jnp.isfinite(x))) for x in flat)


def test_ulysses_packed_matches_single_device():
    """Ulysses SP over a packed batch == single-device packed kernel."""
    from sink_attention_tpu.ops.packed import sink_flash_attention_packed
    from sink_attention_tpu.parallel import (
        make_mesh, ulysses_sink_flash_attention_packed)
    from jax.sharding import PartitionSpec as P

    B, Hq, Hkv, N, D = 1, 4, 2, 256, 32
    ns, W = 4, 64
    segs = [100, 30, 70, 56]
    pos = jnp.concatenate(
        [jnp.arange(L, dtype=jnp.int32) for L in segs])[None]
    ks = jax.random.split(jax.random.PRNGKey(30), 4)
    q = jax.random.normal(ks[0], (B, Hq, N, D), jnp.float32)
    k = jax.random.normal(ks[1], (B, Hkv, N, D), jnp.float32)
    v = jax.random.normal(ks[2], (B, Hkv, N, D), jnp.float32)
    aux = jax.random.normal(ks[3], (Hq,), jnp.float32)

    ref = sink_flash_attention_packed(q, k, v, pos, ns, W, s_aux=aux,
                                      block_q=32, block_kv=32)

    mesh = make_mesh({"seq": 2}, devices=jax.devices()[:2])
    spec = P(None, None, "seq", None)

    def island(q, k, v, pos, aux):
        return ulysses_sink_flash_attention_packed(
            q, k, v, pos, num_sink=ns, window_size=W, s_aux=aux,
            axis_name="seq")

    fn = jax.shard_map(island, mesh=mesh,
                       in_specs=(spec, spec, spec, P(), P()),
                       out_specs=spec, check_vma=False)
    out = fn(q, k, v, pos, aux)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-5)


def test_ring_skip_ahead_step_count():
    """The skip-ahead schedule must rotate only the chunks a window can
    intersect: ppermute count in the traced program is 2*(steps-1)
    (K and V per rotation) instead of 2*(n_dev-1), and ring_num_steps
    reflects the O(window/chunk) bound (VERDICT round-1 item 4; the
    generalization of reference docs/design.md:165-175 to 128K)."""
    from sink_attention_tpu.parallel.ring import ring_num_steps

    assert ring_num_steps(n_dev=32, n_local=4096, window_size=4096) == 2
    assert ring_num_steps(n_dev=8, n_local=128, window_size=512) == 5
    assert ring_num_steps(n_dev=8, n_local=128, window_size=4096) == 8
    assert ring_num_steps(n_dev=4, n_local=256, window_size=1) == 1

    n_dev = 8
    mesh = seq_mesh(n_dev)
    B, H, N, D = 1, 2, 1024, 64
    n_local = N // n_dev
    window = 256  # spans ceil(255/128)+1 = 3 chunks
    q, k, v = make_qkv(jax.random.PRNGKey(11), B, H, H, N, D)

    fn = jax.shard_map(
        lambda q, k, v: ring_sink_flash_attention(
            q, k, v, num_sink=4, window_size=window, axis_name="seq"),
        mesh=mesh, in_specs=(P(None, None, "seq", None),) * 3,
        out_specs=P(None, None, "seq", None), check_vma=False)

    jaxpr_text = str(jax.make_jaxpr(fn)(q, k, v))
    n_ppermute = jaxpr_text.count("ppermute")
    steps = ring_num_steps(n_dev, n_local, window)
    assert steps == 3
    assert n_ppermute == 2 * (steps - 1), n_ppermute

    out = jax.jit(fn)(q, k, v)
    ref = eager_sink_attention(q, k, v, num_sink=4, window_size=window)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4,
                               rtol=1e-3)


def test_ring_permute_precedes_kernel():
    """Double-buffered ring schedule (VERDICT r2 item 4): step s+1's
    ppermute of (k, v) must be issued BEFORE step s's chunk kernel in
    program order, so XLA's latency-hiding scheduler can overlap the ICI
    transfer with the attention compute. Pinned by walking the jaxpr
    equation order: each ppermute pair appears before the chunk-kernel
    call of the same step, and the permute inputs are never kernel
    outputs (BASELINE north star: ring KV collectives overlapped with
    compute)."""
    n_dev = 8
    mesh = seq_mesh(n_dev)
    B, H, N, D = 1, 2, 1024, 64
    window = 256  # 3 ring steps -> 2 ppermute pairs
    q, k, v = make_qkv(jax.random.PRNGKey(21), B, H, H, N, D)

    fn = jax.shard_map(
        lambda q, k, v: ring_sink_flash_attention(
            q, k, v, num_sink=4, window_size=window, axis_name="seq"),
        mesh=mesh, in_specs=(P(None, None, "seq", None),) * 3,
        out_specs=P(None, None, "seq", None), check_vma=False)

    events = []  # ordered ("perm" | "kern") stream

    def walk(jaxpr):
        for eqn in jaxpr.eqns:
            name = eqn.primitive.name
            if name == "ppermute":
                events.append("perm")
            elif "custom_vjp" in name or "pallas" in name:
                events.append("kern")
            else:
                for val in eqn.params.values():
                    for j in jax.tree_util.tree_leaves(
                            val, is_leaf=lambda x: hasattr(x, "eqns")):
                        if hasattr(j, "eqns"):
                            walk(j)
                        elif hasattr(j, "jaxpr"):
                            walk(j.jaxpr)

    closed = jax.make_jaxpr(fn)(q, k, v)
    walk(closed.jaxpr)

    from sink_attention_tpu.parallel.ring import ring_num_steps
    steps = ring_num_steps(n_dev, N // n_dev, window)
    assert steps == 3
    kerns = [i for i, e in enumerate(events) if e == "kern"]
    perms = [i for i, e in enumerate(events) if e == "perm"]
    # `steps` window kernels + 1 sink-phase kernel; 2 ppermutes per hop
    assert len(kerns) == steps + 1 and len(perms) == 2 * (steps - 1), events
    # step s (s < last): its next-hop ppermute pair precedes its kernel
    for s in range(steps - 1):
        assert perms[2 * s] < kerns[s] and perms[2 * s + 1] < kerns[s], (
            f"step {s}: permute after kernel — schedule not double-buffered"
            f" ({events})")


def test_ring_skip_ahead_gradients():
    """Skip-ahead ring (short window over many shards, sink phase active
    on far devices) must still produce exact gradients, including through
    the sink broadcast's psum transpose."""
    n_dev = 4
    mesh = seq_mesh(n_dev)
    B, H, N, D = 1, 2, 512, 64
    q, k, v = make_qkv(jax.random.PRNGKey(12), B, H, H, N, D)
    s_aux = jax.random.normal(jax.random.PRNGKey(13), (H,))
    window = 64  # 1 rotation; devices 1..3 need the sink phase

    ring_fn = jax.shard_map(
        lambda q, k, v, aux: ring_sink_flash_attention(
            q, k, v, num_sink=4, window_size=window, s_aux=aux,
            axis_name="seq"),
        mesh=mesh, in_specs=(P(None, None, "seq", None),) * 3 + (P(None),),
        out_specs=P(None, None, "seq", None), check_vma=False)

    def loss_ring(q, k, v, aux):
        return (ring_fn(q, k, v, aux) ** 2).sum()

    def loss_ref(q, k, v, aux):
        return (eager_sink_attention(q, k, v, num_sink=4, window_size=window,
                                     s_aux=aux) ** 2).sum()

    g_ring = jax.grad(loss_ring, argnums=(0, 1, 2, 3))(q, k, v, s_aux)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(q, k, v, s_aux)
    for a, b in zip(g_ring, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-3,
                                   rtol=1e-2)


@pytest.mark.parametrize("num_sink,window", [
    (4, 128),    # halo regime: window fits one shard
    (4, 640),    # ring regime: window spans shards
    (300, 128),  # sinks spill past shard 0 (n_local=256): must pick ring
])
def test_sharded_dispatcher_matches_single_device(num_sink, window):
    """sharded_sink_flash_attention picks halo SP only when BOTH the
    window and the sink prefix fit in one shard (n_local = 256), ring
    skip-ahead otherwise; all regimes must equal the single-device
    oracle."""
    from sink_attention_tpu.parallel import sharded_sink_flash_attention

    n_dev = 4
    mesh = seq_mesh(n_dev)
    B, H_q, H_kv, N, D = 1, 4, 2, 1024, 64
    q, k, v = make_qkv(jax.random.PRNGKey(7), B, H_q, H_kv, N, D)
    s_aux = jax.random.normal(jax.random.PRNGKey(8), (H_q,))

    out = jax.jit(jax.shard_map(
        lambda q, k, v: sharded_sink_flash_attention(
            q, k, v, num_sink=num_sink, window_size=window, s_aux=s_aux,
            axis_name="seq"),
        mesh=mesh, in_specs=(P(None, None, "seq", None),) * 3,
        out_specs=P(None, None, "seq", None), check_vma=False))(q, k, v)

    ref = eager_sink_attention(q, k, v, num_sink=num_sink,
                               window_size=window, s_aux=s_aux)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4,
                               rtol=1e-3)


def test_fsdp_train_step_matches_unsharded():
    """FSDP/ZeRO: weights + optimizer state sharded over 'data'. Loss must
    match the unsharded step exactly (FSDP is a memory layout, not a
    semantics change); optimizer state leaves must actually be partitioned
    over the data axis."""
    import optax
    from jax.sharding import Mesh
    from sink_attention_tpu.models import ModelConfig, init_params
    from sink_attention_tpu.parallel.train import (cross_entropy_loss,
                                                   make_train_step)

    cfg = ModelConfig.tiny(num_heads=8, num_kv_heads=4, head_dim=16,
                           hidden_size=64, num_experts=2, sliding_window=16,
                           vocab_size=128, num_layers=2)
    params = init_params(cfg, jax.random.PRNGKey(0))
    batch = jax.random.randint(jax.random.PRNGKey(1), (4, 33), 0,
                               cfg.vocab_size)
    opt = optax.adamw(1e-3)

    devs = np.array(jax.devices()[:8]).reshape(2, 2, 2)
    mesh = Mesh(devs, ("data", "seq", "model"))
    step, p_sh = make_train_step(cfg, mesh, opt, fsdp=True)

    # the wq sharding spec must include 'data' on the input dim
    wq_spec = p_sh["layers"][0]["attn"]["wq"].spec
    assert wq_spec == P("data", "model"), wq_spec
    assert p_sh["embed"].spec == P("data", None)

    with mesh:
        params_sh = jax.device_put(params, p_sh)
        opt_state = opt.init(params_sh)
        # Adam mu inherits the fsdp layout -> sharded over data
        mu_wq = opt_state[0].mu["layers"][0]["attn"]["wq"]
        assert "data" in jax.tree_util.tree_leaves(
            [mu_wq.sharding.spec])[0], mu_wq.sharding.spec
        new_params, _, loss = step(params_sh, opt_state, batch)

    ref_loss = cross_entropy_loss(params, cfg, batch)
    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-4)
    # params moved and kept their fsdp sharding
    new_wq = new_params["layers"][0]["attn"]["wq"]
    assert new_wq.sharding.spec == P("data", "model")


def test_remat_and_accum_match_plain_step():
    """jax.checkpoint'd layers and k-microbatch gradient accumulation must
    both reproduce the plain step's loss and updated params exactly (remat
    changes scheduling, not math; equal-size microbatch mean-of-means ==
    full-batch mean)."""
    import optax
    from jax.sharding import Mesh
    from sink_attention_tpu.models import ModelConfig, init_params
    from sink_attention_tpu.parallel.train import make_train_step

    cfg = ModelConfig.tiny(num_heads=4, num_kv_heads=2, head_dim=16,
                           hidden_size=32, num_experts=2, sliding_window=16,
                           vocab_size=64, num_layers=2)
    params = init_params(cfg, jax.random.PRNGKey(0))
    batch = jax.random.randint(jax.random.PRNGKey(1), (8, 17), 0,
                               cfg.vocab_size)
    opt = optax.sgd(1e-2)

    devs = np.array(jax.devices()[:4]).reshape(2, 1, 2)
    mesh = Mesh(devs, ("data", "seq", "model"))

    def run(**kw):
        step, p_sh = make_train_step(cfg, mesh, opt, **kw)
        with mesh:
            p = jax.device_put(params, p_sh)
            st = opt.init(p)
            new_p, _, loss = step(p, st, batch)
        return float(loss), new_p

    loss0, p0 = run()
    loss_r, p_r = run(remat=True)
    loss_a, p_a = run(accum_steps=4)

    np.testing.assert_allclose(loss_r, loss0, rtol=1e-6)
    np.testing.assert_allclose(loss_a, loss0, rtol=1e-5)
    for ref, got, tol in ((p0, p_r, 1e-6), (p0, p_a, 1e-5)):
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=tol, rtol=tol), ref, got)
