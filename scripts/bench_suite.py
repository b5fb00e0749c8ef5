"""Extended performance suite (TPU): the README-table benchmarks.

Mirrors the reference's benchmark harnesses (tests/benchmark.py:126-267 and
tests/run_inference_benchmarks.py) on TPU: prefill latency across N (vs the
reference's published H200 numbers), training fwd+bwd, decode-step latency
(cache append + attention) across window sizes and KV quantizations.

Run on hardware: python scripts/bench_suite.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import datetime
import json
import gc
import time

import jax
import jax.numpy as jnp

RESULTS = {"device": None, "prefill": [], "train": [], "decode": []}

from sink_attention_tpu.cache import SinkKVCache
from sink_attention_tpu.ops import (
    sink_decode_attention_cached,
    sink_flash_attention,
)
from sink_attention_tpu.utils import (
    V5E_PEAK_BF16,
    sink_attention_flops,
    time_chained,
)

B, HQ, HKV, D, NS, W = 1, 32, 8, 128, 4, 4096
REF = {4096: 0.80, 8192: 2.09, 16384: 4.67, 32768: 9.85}  # H200 ms
REF_TRAIN = {4096: 2.81, 8192: 7.28, 16384: 16.39}        # H200 fwd+bwd ms


def qkv(N, dtype=jnp.bfloat16):
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    return (jax.random.normal(ks[0], (B, HQ, N, D), dtype=dtype),
            jax.random.normal(ks[1], (B, HKV, N, D), dtype=dtype),
            jax.random.normal(ks[2], (B, HKV, N, D), dtype=dtype))


def prefill_table():
    RESULTS["prefill"] = []
    print("\n=== Prefill forward (bf16, GQA 32/8, D=128, sink=4, W=4096) ===")
    print(f"{'N':>7} {'ms':>8} {'TFLOP/s':>9} {'MFU%':>6} {'ref H200 ms':>12}")
    # 64K/128K rows: the long-context regime where O(N*(sink+W)) wins —
    # the reference's scaling claim (README.md:246-253) is only *projected*
    # past 32K; here it is measured.
    for N in [4096, 8192, 16384, 32768, 65536, 131072]:
        q, k, v = qkv(N)
        # k, v via *consts, NOT closures: closure-captured arrays become
        # inline jit constants, and at 64K+ the serialized compile request
        # exceeds the remote-compile tunnel's size limit (HTTP 413)
        dt = time_chained(
            lambda q, k, v: sink_flash_attention(q, k, v, NS, W), q, k, v)
        fl = sink_attention_flops(B, HQ, N, D, NS, W)
        ref = REF.get(N)
        RESULTS["prefill"].append(
            {"N": N, "ms": dt * 1e3, "tflops": fl / dt / 1e12,
             "mfu": fl / dt / V5E_PEAK_BF16, "ref_h200_ms": ref})
        print(f"{N:>7} {dt*1e3:>8.2f} {fl/dt/1e12:>9.1f} "
              f"{fl/dt/V5E_PEAK_BF16*100:>6.1f} "
              f"{ref if ref else '-':>12}")


def train_table():
    RESULTS["train"] = []
    print("\n=== Training fwd+bwd (bf16) ===")
    print(f"{'N':>7} {'ms':>8} {'ref H200 ms':>12}")
    for N in [8192, 16384]:
        q, k, v = qkv(N)
        aux = jax.random.normal(jax.random.PRNGKey(3), (HQ,))

        def step(q):
            def loss(q):
                o = sink_flash_attention(q, k, v, NS, W, s_aux=aux)
                return jnp.sum(o.astype(jnp.float32) ** 2)
            return jax.grad(loss)(q).astype(q.dtype)

        dt = time_chained(step, q, iters_lo=2, iters_hi=8)
        RESULTS["train"].append(
            {"N": N, "ms": dt * 1e3, "ref_h200_ms": REF_TRAIN.get(N)})
        print(f"{N:>7} {dt*1e3:>8.2f} {REF_TRAIN.get(N, '-'):>12}")


def baseline_table():
    """Same-silicon strong baseline: stock JAX Pallas attention kernels
    (splash attention — the production MaxText kernel — and the legacy
    pallas flash kernel), full-causal, vs our sink+window kernel on the
    SAME chip. The TPU analog of the reference's FA2-crossover table
    (/root/reference/README.md:227-244): full causal does O(N^2) work,
    sink+window O(N*(sink+W)), so ours pulls ahead once N >> W.

    Both baselines lack sink support entirely (that is the point of this
    package); KV is expanded to H_q heads for them (splash MHA wants
    matched heads — the reference did the same for torch SDPA)."""
    from jax.experimental.pallas.ops.tpu.splash_attention import (
        splash_attention_kernel as sk,
        splash_attention_mask as mask_lib,
    )

    print("\n=== Same-silicon baseline: full-causal stock kernels vs "
          "sink+window (bf16, GQA 32/8 -> MHA-expanded, D=128) ===")
    print(f"{'N':>7} {'ours ms':>9} {'splash ms':>10} {'speedup':>8} "
          f"{'ours+bwd':>9} {'splash+bwd':>11} {'speedup':>8}")
    RESULTS["baseline"] = []
    scale = 1.0 / (D ** 0.5)
    # stops at 32K like the reference's FA2 table: full-causal fwd+bwd at
    # 64K with MHA-expanded KV overflows a 16 GB chip (the baseline OOMs,
    # not ours — our own 64K/128K rows are in the prefill table)
    for N in [4096, 8192, 16384, 32768]:
        q, k, v = qkv(N)
        rep = HQ // HKV
        k_e = jnp.repeat(k, rep, axis=1)
        v_e = jnp.repeat(v, rep, axis=1)

        mask = mask_lib.MultiHeadMask(
            [mask_lib.CausalMask((N, N)) for _ in range(HQ)])
        splash = sk.make_splash_mha(mask, head_shards=1, q_seq_shards=1)

        # operands via *consts (closure constants hang remote compile)
        def splash_fwd(q, ke, ve):
            return jax.vmap(splash)(q * scale, ke, ve)

        def ours_fwd(q, k, v):
            return sink_flash_attention(q, k, v, NS, W)

        def bwd(fwd):
            def step(q, *kv):
                def loss(q):
                    return jnp.sum(fwd(q, *kv).astype(jnp.float32) ** 2)
                return jax.grad(loss)(q).astype(q.dtype)
            return step

        t_ours = time_chained(ours_fwd, q, k, v)
        t_splash = time_chained(splash_fwd, q, k_e, v_e)
        t_ours_b = time_chained(bwd(ours_fwd), q, k, v,
                                iters_lo=2, iters_hi=8)
        t_splash_b = time_chained(bwd(splash_fwd), q, k_e, v_e,
                                  iters_lo=2, iters_hi=8)
        RESULTS["baseline"].append(
            {"N": N, "ours_fwd_ms": t_ours * 1e3,
             "splash_fwd_ms": t_splash * 1e3,
             "ours_fwdbwd_ms": t_ours_b * 1e3,
             "splash_fwdbwd_ms": t_splash_b * 1e3})
        print(f"{N:>7} {t_ours*1e3:>9.2f} {t_splash*1e3:>10.2f} "
              f"{t_splash/t_ours:>7.2f}x {t_ours_b*1e3:>9.2f} "
              f"{t_splash_b*1e3:>11.2f} {t_splash_b/t_ours_b:>7.2f}x")
        del q, k, v, k_e, v_e
        gc.collect()


def decode_table():
    """Per-step latency + HBM-bandwidth roofline accounting per KV format.

    A decode step's classical floor is one full read of the cache's K/V
    storage (+ scale rows when quantized) — the q vector, appended KV,
    and output are negligible. %roof = that byte count / measured step
    time / the chip's HBM bandwidth (the TPU analog of the reference's
    decode tables, reference README.md:322-349). At B=1 the scan-carried
    cache fits VMEM and XLA keeps it on-chip, so rows can exceed 100% —
    the column is then an effective rate, not a physical HBM stream (the
    engine table, 8 slots, measures the genuinely HBM-bound regime)."""
    RESULTS["decode"] = []
    from sink_attention_tpu.utils import V5E_HBM_BW

    print("\n=== Decode step: cache append + attention (B=1, D=128) ===")
    print(f"{'W':>6} {'GQA':>6} {'kv':>6} {'ms/step':>9} {'GB/s':>7} "
          f"{'%roof':>6} {'ref H200 ms':>12}")
    # (W, H_q, quants): mirrors the reference's decode tables
    # (README.md:322-349) — W sweep at GQA 32/8 plus the GQA 64/8 row;
    # quantized formats only at the headline W.
    cases = [(128, HQ, [None]), (1024, HQ, [None]),
             (4096, HQ, [None, "int8", "fp8"]), (4096, 64, [None])]
    for W_, HQ_, quants in cases:
        for quant in quants:
            dtype = jnp.bfloat16
            cache = SinkKVCache.init(B, HKV, D, num_sink=NS, window_size=W_,
                                     dtype=dtype, quant=quant)
            ks = jax.random.split(jax.random.PRNGKey(1), 3)
            cache = cache.prefill(
                jax.random.normal(ks[0], (B, HKV, W_ + NS, D), dtype),
                jax.random.normal(ks[1], (B, HKV, W_ + NS, D), dtype))
            aux = jax.random.normal(ks[2], (HQ_,))

            def steps_fn(q0, cache, n):
                def body(carry, _):
                    q, cache = carry
                    kv = q[:, :HKV]  # any [B,HKV,1,D] values do
                    cache = cache.append(kv, kv)
                    o = sink_decode_attention_cached(q, cache, s_aux=aux)
                    return (o, cache), ()
                (o, cache), _ = jax.lax.scan(body, (q0, cache), None,
                                             length=n)
                return jnp.sum(o.astype(jnp.float32))

            q0 = jax.random.normal(ks[2], (B, HQ_, 1, D), dtype)
            jfn = jax.jit(steps_fn, static_argnums=2)
            # big windows: at ~0.02 ms/step the 64/320 differencing
            # was dominated by dispatch jitter (one run printed an
            # impossible >100% of HBM roofline)
            lo, hi = 256, 1280
            f_lo = lambda q, c: jfn(q, c, lo)
            f_hi = lambda q, c: jfn(q, c, hi)
            float(f_lo(q0, cache)); float(f_hi(q0, cache))
            dts = []
            for _ in range(3):
                t0 = time.perf_counter(); float(f_lo(q0, cache))
                t1 = time.perf_counter(); float(f_hi(q0, cache))
                t2 = time.perf_counter()
                dts.append(((t2 - t1) - (t1 - t0)) / (hi - lo))
            dt = sorted(dts)[1]
            # reference cache+decode totals (README.md:341-349): W=4096
            # 0.201 ms at GQA 32/8, 0.290 at 64/8; W sweep rows published
            # decode-only + ~0.08 cache update (README.md:328-330, 346)
            ref = ({4096: 0.290} if HQ_ == 64 else
                   {128: 0.056 + 0.08, 1024: 0.056 + 0.08,
                    4096: 0.201}).get(W_)
            step_bytes = cache.k.nbytes + cache.v.nbytes
            if quant:  # scale rows are read alongside the quantized KV
                step_bytes += cache.k_scale.nbytes + cache.v_scale.nbytes
            gbps = step_bytes / dt / 1e9
            roof = step_bytes / dt / V5E_HBM_BW
            RESULTS["decode"].append(
                {"window": W_, "gqa": f"{HQ_}/{HKV}",
                 "kv": quant or "bf16", "ms_per_step": dt * 1e3,
                 "step_bytes": step_bytes, "gb_per_s": gbps,
                 "hbm_roofline": roof, "ref_h200_ms": ref})
            print(f"{W_:>6} {HQ_:>3}/{HKV:<2} {str(quant or 'bf16'):>6} "
                  f"{dt*1e3:>9.3f} {gbps:>7.1f} {roof*100:>5.1f}% "
                  f"{ref if ref else '-':>12}")


def engine_table():
    """Continuous-batching serving throughput (tokens/s/chip).

    Model: gpt-oss-20b layer geometry (2880 hidden, 64/8 heads GQA, 32
    experts top-4, alternating sliding/full) truncated to 4 layers so it
    fits one v5e (~9 GB bf16) — per-layer costs match the real model, so
    tokens/s/chip/layer extrapolates. The reference has no serving
    throughput numbers (and no continuous batching) to compare against.
    """
    RESULTS["engine"] = []
    from sink_attention_tpu.models import ModelConfig, init_params
    from sink_attention_tpu.serving import ContinuousBatchingEngine

    print("\n=== Continuous batching decode throughput "
          "(gpt-oss-20b geometry, 4 layers) ===")
    print(f"{'slots':>6} {'kv':>6} {'weights':>7} {'chunk':>6} "
          f"{'ms/tok':>9} {'tok/s/chip':>11}")
    cfg = ModelConfig.gpt_oss_20b(num_layers=4)
    params = init_params(cfg, jax.random.PRNGKey(0), jnp.bfloat16)
    prompt = list(range(1, 65))
    for max_batch in (1, 8):
        for quant in (None, "int8"):
            for chunk in (1, 32):
                eng = ContinuousBatchingEngine(
                    params, cfg, max_batch=max_batch, max_len=4096,
                    prefill_bucket=64, dtype=jnp.bfloat16, quant=quant)
                _run_engine(eng, max_batch, quant or "bf16", "bf16", chunk,
                            prompt)
                del eng
                gc.collect()
    # INT8 *weights* (decode is weight-bandwidth-bound at small batch).
    # inplace=True quantizes tensor-by-tensor, freeing each bf16 source
    # before the next — the functional variant peaks at bf16 + int8 +
    # transients (~15 GB), which overflows the 16 GB chip.
    from sink_attention_tpu.models import quantize_params
    qparams = quantize_params(params, inplace=True)
    del params
    gc.collect()
    for max_batch in (1, 8, 16, 32, 64):
        eng = ContinuousBatchingEngine(
            qparams, cfg, max_batch=max_batch, max_len=4096,
            prefill_bucket=64, dtype=jnp.bfloat16)
        _run_engine(eng, max_batch, "bf16", "int8", 32, prompt)
        del eng
        gc.collect()


def spec_table():
    """On-device speculative decoding vs plain greedy decode, wall-clock.

    The model pair fixes the acceptance fraction to the regime real
    draft/target pairs operate in (~0.75): target = 8-layer tiny model
    with layers 1-7 scaled by 0.1, draft = the target's layer 0 plus its
    shared embed/head (a 1-layer model, ~1/8 the per-token cost).
    Acceptance is a property of the PAIR; this table measures the
    speculative ENGINE's overhead at a given acceptance. Output is pinned
    identical to plain greedy (zero host syncs per draft token). The
    reference has no speculative loop (only the cache-side multi-token
    append, reference cache.py:176-183)."""
    from sink_attention_tpu.models import ModelConfig, init_params
    from sink_attention_tpu.serving import (greedy_generate,
                                            speculative_generate)

    print("\n=== Speculative decoding vs plain greedy (8-layer target, "
          "1-layer draft, K=8) ===")
    cfg_t = ModelConfig.tiny(num_layers=8, vocab_size=256)
    cfg_d = ModelConfig.tiny(num_layers=1, vocab_size=256)
    pt = init_params(cfg_t, jax.random.PRNGKey(0), jnp.bfloat16)
    pt["layers"] = [pt["layers"][0]] + [
        jax.tree.map(lambda x: x * 0.1, l) for l in pt["layers"][1:]]
    pd = {k: v for k, v in pt.items() if k != "layers"}
    pd["layers"] = [pt["layers"][0]]
    ids = jax.random.randint(jax.random.PRNGKey(1), (1, 64), 0, 256)
    max_new = 256

    # one compiled program each — generation helpers are jittable but not
    # self-jitting, and per-op dispatch would otherwise dominate
    plain_fn = jax.jit(lambda p, i: greedy_generate(
        p, cfg_t, i, max_new_tokens=max_new, dtype=jnp.bfloat16))
    spec_fn = jax.jit(lambda p, d, i: speculative_generate(
        p, d, cfg_t, cfg_d, i, max_new, num_draft_tokens=8,
        dtype=jnp.bfloat16))

    def t_plain():
        return jax.block_until_ready(plain_fn(pt, ids))

    def t_spec():
        toks, rate = spec_fn(pt, pd, ids)
        return jax.block_until_ready(toks), rate

    ref = t_plain()                     # compile
    spec_toks, rate = t_spec()          # compile
    import numpy as np
    match = bool((np.asarray(spec_toks) == np.asarray(ref)).all())
    times_p, times_s = [], []
    for _ in range(3):
        t0 = time.perf_counter(); t_plain()
        t1 = time.perf_counter(); t_spec()
        t2 = time.perf_counter()
        times_p.append(t1 - t0); times_s.append(t2 - t1)
    tp, ts = sorted(times_p)[1], sorted(times_s)[1]
    rate = float(rate)
    RESULTS["speculative"] = {
        "max_new": max_new, "draft_k": 8,
        "plain_ms": tp * 1e3, "spec_ms": ts * 1e3,
        "speedup": tp / ts, "tokens_per_target_pass": rate,
        # bf16 near-tie argmax divergence between the single- and
        # multi-token attention is expected (generate.py docstring);
        # exact parity is pinned in fp32 by
        # tests/test_model.py::test_speculative_generate_equals_greedy
        "acceptance_fraction": (rate - 1) / 8, "greedy_match_bf16": match}
    print(f"plain {tp*1e3:8.1f} ms   spec {ts*1e3:8.1f} ms   "
          f"speedup {tp/ts:4.2f}x   tokens/target-pass {rate:.2f} "
          f"(acc {(rate-1)/8:.2f})   greedy-match(bf16) {match}")


def engine_arrival_table():
    """Open-loop continuous-arrival serving: Poisson arrivals against the
    engine's async admission (prefill + on-device first-token sample
    dispatched back-to-back with the decode chunk, no host sync per
    admission). Reports sustained tok/s and admission latency percentiles
    (scheduled arrival -> first token on host). The reference has no
    serving engine, hence no arrival benchmark, to compare against.
    """
    import numpy as np

    from sink_attention_tpu.models import ModelConfig, init_params
    from sink_attention_tpu.serving import ContinuousBatchingEngine

    print("\n=== Poisson-arrival serving (gpt-oss-20b geometry, 4 layers, "
          "8 slots, chunk=8) ===")
    cfg = ModelConfig.gpt_oss_20b(num_layers=4)
    params = init_params(cfg, jax.random.PRNGKey(0), jnp.bfloat16)
    slots, chunk, max_new, n_req = 8, 8, 64, 48
    prompt = list(range(1, 65))
    first_t = {}
    t_start = None

    def on_first(rid, _tok):
        first_t[rid] = time.perf_counter() - t_start

    eng = ContinuousBatchingEngine(params, cfg, max_batch=slots,
                                   max_len=4096, prefill_bucket=64,
                                   dtype=jnp.bfloat16,
                                   first_token_cb=on_first)
    # calibrate: saturate the pool and time a STEADY-STATE chunk (no
    # request finishes inside it — per-slot cache clears at completion
    # would pollute the measurement)
    for _ in range(slots):
        eng.submit(prompt, max_new_tokens=chunk * 7)
    t_start = time.perf_counter()  # (on_first needs it during warmup)
    eng.step_chunk(chunk)  # admit + compile
    eng.step_chunk(chunk)  # warm
    cal = []
    for _ in range(3):  # median: remote-link jitter is real
        t0 = time.perf_counter()
        eng.step_chunk(chunk)
        cal.append(time.perf_counter() - t0)
    chunk_s = sorted(cal)[1]
    eng.run(chunk=chunk)  # drain
    first_t.clear()
    cap_tps = slots * chunk / chunk_s  # saturated tokens/s
    # offered load ~35% of saturated capacity in *requests*/s: a stable
    # queue, so the latency percentiles measure ADMISSION mechanics
    # (remaining in-flight chunk + prefill), not queue drain. The floor
    # is structural: a request arriving mid-chunk waits for that chunk,
    # then its prefill; its first token is host-visible before the next
    # chunk completes (first_token_cb) — ~1 chunk + 1 prefill.
    lam = 0.35 * cap_tps / max_new
    rng = np.random.default_rng(0)
    arrivals = np.cumsum(rng.exponential(1.0 / lam, size=n_req))

    t_start = time.perf_counter()
    submit_t = {}
    done_tokens = 0
    i = 0
    while i < n_req or eng.active_count or eng._queue:
        now = time.perf_counter() - t_start
        while i < n_req and arrivals[i] <= now:
            rid = eng.submit(prompt, max_new_tokens=max_new)
            submit_t[rid] = arrivals[i]
            i += 1
        if not (eng.active_count or eng._queue):
            if i < n_req:  # idle until the next scheduled arrival
                time.sleep(max(arrivals[i] - (time.perf_counter() -
                                              t_start), 0))
            continue
        out = eng.step_chunk(chunk)
        for _rid, toks in out.items():
            done_tokens += len(toks)
    wall = time.perf_counter() - t_start
    lat = np.asarray(sorted(first_t[r] - submit_t[r] for r in first_t))
    p50, p99 = np.percentile(lat, 50), np.percentile(lat, 99)
    tps = done_tokens / wall
    RESULTS["arrival"] = {
        "slots": slots, "chunk": chunk, "chunk_ms": chunk_s * 1e3,
        "offered_req_per_s": float(lam), "n_requests": n_req,
        "tokens_per_s": tps, "admission_p50_ms": p50 * 1e3,
        "admission_p99_ms": p99 * 1e3,
        "p99_vs_chunk": float(p99 / chunk_s)}
    print(f"chunk wall {chunk_s*1e3:.1f} ms; offered {lam:.2f} req/s; "
          f"served {tps:.1f} tok/s; admission p50 {p50*1e3:.1f} ms, "
          f"p99 {p99*1e3:.1f} ms ({p99/chunk_s:.2f}x one chunk)")


def beam_table():
    """Beam search (fully jitted: scoring + cache reorder inside one
    scan) vs greedy, wall-clock. Beam cost scales with num_beams through
    the flattened cache batch dim; the per-step reorder is the overhead
    under test. The reference's beam support is HF generate() +
    reorder_cache (reference cache.py:230-238) with no published beam
    numbers."""
    from sink_attention_tpu.models import ModelConfig, init_params
    from sink_attention_tpu.serving import beam_generate, greedy_generate

    print("\n=== Beam search vs greedy (8-layer tiny model, max_new=128) "
          "===")
    cfg = ModelConfig.tiny(num_layers=8, vocab_size=256)
    params = init_params(cfg, jax.random.PRNGKey(0), jnp.bfloat16)
    ids = jax.random.randint(jax.random.PRNGKey(1), (1, 64), 0, 256)
    max_new = 128
    RESULTS["beam"] = []

    def greedy_ms(batch):
        ids_b = jnp.broadcast_to(ids, (batch, ids.shape[1]))
        fn = jax.jit(lambda p, i: greedy_generate(
            p, cfg, i, max_new_tokens=max_new, dtype=jnp.bfloat16))
        jax.block_until_ready(fn(params, ids_b))
        t0 = time.perf_counter()
        jax.block_until_ready(fn(params, ids_b))
        return (time.perf_counter() - t0) * 1e3

    t_greedy = greedy_ms(1)
    for K in (4, 8, 32):
        beam_fn = jax.jit(lambda p, i, K=K: beam_generate(
            p, cfg, i, max_new_tokens=max_new, num_beams=K, eos_id=7,
            dtype=jnp.bfloat16)[0])
        jax.block_until_ready(beam_fn(params, ids))
        t0 = time.perf_counter()
        t_beam = None
        jax.block_until_ready(beam_fn(params, ids))
        t_beam = (time.perf_counter() - t0) * 1e3
        # equal-batch greedy isolates the beam machinery (scoring +
        # reorder) from plain batch-width cost: K beams decode K cache
        # rows whether or not they are beams
        t_gb = greedy_ms(K)
        RESULTS["beam"].append(
            {"num_beams": K, "max_new": max_new,
             "greedy_ms": t_greedy, "beam_ms": t_beam,
             "cost_vs_greedy": t_beam / t_greedy,
             "greedy_batchK_ms": t_gb,
             "cost_vs_greedy_batchK": t_beam / t_gb})
        print(f"K={K}: beam {t_beam:8.1f} ms vs greedy B=1 "
              f"{t_greedy:8.1f} ms ({t_beam/t_greedy:.2f}x) vs greedy "
              f"B={K} {t_gb:8.1f} ms ({t_beam/t_gb:.2f}x)")


def int4serve_table():
    """Full 24-layer gpt-oss-20b on ONE 16 GB v5e: int4 layer weights +
    int8 embed/lm_head (~11 GB). The only single-chip configuration that
    fits the whole model — the reference has no quantization and cannot
    fit it on any 16 GB device. Decode matmuls use the XLA-fused nibble
    path (ops/int4.py), which at decode shapes beats even int8 in
    wall-clock while moving half the HBM bytes."""
    from sink_attention_tpu.models import ModelConfig, init_quantized_params
    from sink_attention_tpu.serving import ContinuousBatchingEngine

    print("\n=== Full gpt-oss-20b (24 layers) single-chip serving, "
          "int4 weights ===")
    cfg = ModelConfig.gpt_oss_20b()
    params = init_quantized_params(cfg, jax.random.PRNGKey(0), bits=4)
    prompt = list(range(1, 65))
    RESULTS["int4_serving"] = []
    for slots in (1, 8):
        eng = ContinuousBatchingEngine(params, cfg, max_batch=slots,
                                       max_len=4096, prefill_bucket=64,
                                       dtype=jnp.bfloat16)
        for _ in range(slots):
            eng.submit(prompt, max_new_tokens=1 << 30)
        eng.step_chunk(32); eng.step_chunk(32)  # compile + warm
        n = 3
        t0 = time.perf_counter()
        for _ in range(n):
            eng.step_chunk(32)
        dt = (time.perf_counter() - t0) / (n * 32)
        tps = slots / dt
        RESULTS["int4_serving"].append(
            {"slots": slots, "weights": "int4(+int8 embed/head)",
             "chunk": 32, "ms_per_tok": dt * 1e3, "tokens_per_s": tps})
        print(f"slots={slots}  {dt*1e3:7.2f} ms/tok  {tps:7.1f} tok/s/chip")
        del eng
        gc.collect()
    del params
    gc.collect()


def _run_engine(eng, max_batch, kv_quant, w_quant, chunk, prompt):
    for _ in range(max_batch):
        eng.submit(prompt, max_new_tokens=1 << 30)
    step = (lambda: eng.step_chunk(chunk)) if chunk > 1 else eng.step
    step()  # admits + compiles prefill + decode
    step()  # warm
    n = max(2, 64 // chunk)
    t0 = time.perf_counter()
    for _ in range(n):
        step()
    dt = (time.perf_counter() - t0) / (n * chunk)
    tps = max_batch / dt
    RESULTS["engine"].append(
        {"slots": max_batch, "kv": kv_quant, "weights": w_quant,
         "chunk": chunk, "ms_per_tok": dt * 1e3, "tokens_per_s": tps})
    print(f"{max_batch:>6} {kv_quant:>6} {w_quant:>7} "
          f"{chunk:>6} {dt*1e3:>9.2f} {tps:>11.1f}")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", type=str, default=None,
                    help="write results to this JSON file")
    ap.add_argument("--engine", action="store_true",
                    help="also run the serving-throughput section (slow)")
    ap.add_argument("--only", type=str, default=None,
                    help="comma-separated subset of tables to run "
                         "(prefill,train,baseline,decode,engine,arrival,"
                         "spec)")
    args = ap.parse_args()
    print(f"backend: {jax.default_backend()}, devices: {jax.devices()}")
    only = args.only.split(",") if args.only else None
    if args.json and only and os.path.exists(args.json):
        # partial run (--only): update the existing file in place instead
        # of clobbering the tables we are not re-measuring
        with open(args.json) as f:
            RESULTS.update(json.load(f))
    RESULTS["device"] = jax.devices()[0].device_kind
    RESULTS["date"] = datetime.date.today().isoformat()
    if "engine" not in RESULTS:
        RESULTS["engine"] = []

    def want(name):
        return only is None or name in only

    def flush():
        # write after EVERY table: an hour of measurements must not be
        # lost to a crash in a later table
        if args.json:
            with open(args.json, "w") as f:
                json.dump(RESULTS, f, indent=1)

    if want("prefill"):
        prefill_table(); flush()
    if want("train"):
        train_table(); flush()
    if want("baseline"):
        baseline_table(); flush()
    if want("decode"):
        decode_table(); flush()
    if (args.engine and only is None) or (only and "engine" in only):
        engine_table(); flush()
    if (args.engine and only is None) or (only and "arrival" in only):
        engine_arrival_table(); flush()
    if (args.engine and only is None) or (only and "spec" in only):
        spec_table(); flush()
    if (args.engine and only is None) or (only and "beam" in only):
        beam_table(); flush()
    if (args.engine and only is None) or (only and "int4serve" in only):
        int4serve_table(); flush()
    if args.json:
        flush()
        print(f"wrote {args.json}")
