"""One simulated host of a 2-process CPU 'slice' (driven by
test_multihost.py, not collected by pytest).

Each process presents 2 local CPU devices (4 global), connects to the
coordinator, builds the package's hybrid DCN x ICI mesh
(``make_multihost_mesh``), and runs (1) a psum over the whole mesh and
(2) one DP x TP sharded training step. Results go to a JSON file the
parent asserts on. This is the multi-host analog of the reference's
torch.distributed layer (sp_utils.py), which has no tests at all
(SURVEY.md §4 "No distributed tests exist").
"""

import json
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = [f for f in os.environ.get("XLA_FLAGS", "").split()
          if "xla_force_host_platform_device_count" not in f]
os.environ["XLA_FLAGS"] = " ".join(
    _flags + ["--xla_force_host_platform_device_count=2"])

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import functools

import jax

jax.config.update("jax_platforms", "cpu")


def main():
    pid, port, out_path = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                               num_processes=2, process_id=pid)
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 4, jax.devices()

    import numpy as np
    import jax.numpy as jnp
    import optax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from sink_attention_tpu.models import ModelConfig, init_params
    from sink_attention_tpu.parallel.mesh import make_multihost_mesh
    from sink_attention_tpu.parallel.train import make_train_step

    # 'data' splits across the two processes (DCN), 'model' stays
    # process-local (the ICI domain)
    mesh = make_multihost_mesh({"data": 2, "seq": 1, "model": 2},
                               dcn_axes=("data",))
    assert dict(zip(mesh.axis_names, mesh.devices.shape)) == {
        "data": 2, "seq": 1, "model": 2}
    # every 'model' pair must be process-local for the collectives to
    # ride the fast domain — the layout rule make_multihost_mesh encodes
    for row in mesh.devices.reshape(2, 2):
        assert len({d.process_index for d in row}) == 1, row

    # 1) cross-process psum over the full mesh
    x = jax.make_array_from_callback(
        (2, 2), NamedSharding(mesh, P("data", "model")),
        lambda idx: np.arange(4.0, dtype=np.float32).reshape(2, 2)[idx])
    total = jax.jit(jax.shard_map(
        lambda b: jax.lax.psum(b, ("data", "model")),
        mesh=mesh, in_specs=P("data", "model"), out_specs=P()))(x)
    psum_val = float(np.asarray(total).ravel()[0])

    # 2) one sharded train step (DP over processes, TP within each)
    cfg = ModelConfig.tiny(num_layers=2, vocab_size=64)
    opt = optax.sgd(1e-2)
    step, p_shardings = make_train_step(cfg, mesh, opt)
    params = jax.jit(
        lambda: init_params(cfg, jax.random.PRNGKey(0), jnp.float32),
        out_shardings=p_shardings)()
    opt_state = jax.jit(opt.init)(params)
    batch = jax.make_array_from_callback(
        (4, 32), NamedSharding(mesh, P("data", None)),
        lambda idx: np.tile(np.arange(32, dtype=np.int32) % 64,
                            (4, 1))[idx])
    params, opt_state, loss = step(params, opt_state, batch)
    loss_val = float(jax.device_get(loss))

    # 3) ring attention across the 2-process topology vs the eager oracle
    # (each process derives the same full reference from the shared seed;
    # the ring output is forced replicated so both hosts can read it).
    # n_local=8 < window-reach -> 3 of 4 rotations + the broadcast sink
    # phase, i.e. the skip-ahead schedule's every branch crosses the
    # process boundary.
    from jax.sharding import Mesh
    from sink_attention_tpu.ops.reference import eager_sink_attention
    from sink_attention_tpu.parallel.ring import ring_sink_flash_attention

    B, H, N, D, ns, W = 1, 2, 32, 8, 2, 12
    rng = np.random.default_rng(7)
    qkv_np = [rng.standard_normal((B, H, N, D)).astype(np.float32)
              for _ in range(3)]
    aux_np = rng.standard_normal((H,)).astype(np.float32)
    ring_mesh = Mesh(np.asarray(jax.devices()).reshape(4), ("seq",))
    seq_sh = NamedSharding(ring_mesh, P(None, None, "seq", None))
    qkv = [jax.make_array_from_callback(
        a.shape, seq_sh, lambda idx, a=a: a[idx]) for a in qkv_np]
    aux = jax.make_array_from_callback(
        aux_np.shape, NamedSharding(ring_mesh, P()),
        lambda idx: aux_np[idx])
    ring = jax.jit(
        jax.shard_map(
            lambda q, k, v, a: ring_sink_flash_attention(
                q, k, v, num_sink=ns, window_size=W, s_aux=a,
                axis_name="seq", interpret=True),
            mesh=ring_mesh,
            in_specs=(P(None, None, "seq", None),) * 3 + (P(),),
            out_specs=P(None, None, "seq", None),
            check_vma=False),
        out_shardings=NamedSharding(ring_mesh, P()))
    ring_out = ring(*qkv, aux)
    ref = eager_sink_attention(*qkv_np, ns, W, s_aux=aux_np)
    ring_err = float(np.max(np.abs(np.asarray(ring_out) -
                                   np.asarray(ref))))

    # 4) TP-sharded decode: serving/sharded.py generate over the 2x2
    # mesh's process-local 'model' axis vs the single-device greedy path
    # (run process-locally — same seed, same params)
    from sink_attention_tpu.serving import greedy_generate
    from sink_attention_tpu.serving.sharded import make_sharded_generate

    ids = jnp.asarray(rng.integers(0, 64, (1, 8)), jnp.int32)
    p_sh, tp_gen = make_sharded_generate(cfg, mesh, dtype=jnp.float32,
                                         interpret=True)
    params_tp = jax.jit(
        lambda: init_params(cfg, jax.random.PRNGKey(0), jnp.float32),
        out_shardings=p_sh)()
    tp_toks = np.asarray(jax.jit(
        tp_gen, static_argnums=2,
        out_shardings=NamedSharding(mesh, P()))(params_tp, ids, 6))
    params_local = init_params(cfg, jax.random.PRNGKey(0), jnp.float32)
    ref_toks = np.asarray(greedy_generate(params_local, cfg, ids, 6,
                                          dtype=jnp.float32))
    tp_match = bool((tp_toks == ref_toks).all())

    with open(out_path, "w") as f:
        json.dump({"process": pid, "psum": psum_val, "loss": loss_val,
                   "ring_err": ring_err, "tp_match": tp_match,
                   "n_processes": jax.process_count(),
                   "n_devices": len(jax.devices())}, f)


if __name__ == "__main__":
    main()
