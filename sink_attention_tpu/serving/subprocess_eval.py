"""Subprocess evaluation harness: generation in a fresh process.

TPU analog of the reference's clean-CUDA-context harness
(/root/reference/sink_attention/subprocess_eval.py:51-210): after a training
run (or a crashed one), the accelerator runtime in the parent process can be
wedged or holding memory; generation runs in a fresh subprocess with its own
TPU client. Config and results travel via JSON temp files; failures retry on
a fallback-platform schedule (TPU -> CPU) instead of the reference's GPU-count
escalation [1,2,4] (subprocess_eval.py:164-194).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
from typing import List, Optional, Sequence

__all__ = ["subprocess_generate"]

_WORKER = r"""
import json, os, sys

cfg_path, out_path = sys.argv[1], sys.argv[2]
with open(cfg_path) as f:
    cfg = json.load(f)

import jax
import jax.numpy as jnp

# Platform plugins (e.g. the axon TPU tunnel) can override the env var;
# force the requested platform through the config as well.
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

from sink_attention_tpu.models import (ModelConfig, init_params,
                                       load_hf_checkpoint)
from sink_attention_tpu.serving import greedy_generate

if cfg["checkpoint"]:
    model_cfg, params = load_hf_checkpoint(cfg["checkpoint"],
                                           dtype=jnp.bfloat16)
else:
    model_cfg = ModelConfig(**cfg["model_config"])
    params = init_params(model_cfg, jax.random.PRNGKey(cfg["seed"]),
                         dtype=jnp.bfloat16)

results = []
for ids in cfg["input_ids"]:
    toks = greedy_generate(params, model_cfg,
                           jnp.asarray([ids], jnp.int32),
                           max_new_tokens=cfg["max_new_tokens"],
                           quant=cfg["quant"])
    results.append([int(t) for t in toks[0]])

with open(out_path, "w") as f:
    json.dump({"generated_ids": results}, f)
"""


def subprocess_generate(
    input_ids: Sequence[Sequence[int]],
    checkpoint: Optional[str] = None,
    model_config: Optional[dict] = None,
    max_new_tokens: int = 32,
    quant: Optional[str] = None,
    seed: int = 0,
    timeout: float = 1800.0,
    platforms: Sequence[Optional[str]] = (None, "cpu"),
    verbose: bool = True,
) -> List[List[int]]:
    """Generate in a fresh subprocess (clean TPU context).

    Args:
        input_ids: list of prompts (token id lists).
        checkpoint: local HF checkpoint dir (safetensors), or None to use
            ``model_config`` (ModelConfig kwargs) with random init.
        platforms: fallback schedule; None = default platform, then 'cpu'.

    Returns:
        list of generated-token-id lists ([] on total failure, mirroring the
        reference's empty-list-on-failure contract, subprocess_eval.py:195-198).
    """
    cfg = {
        "input_ids": [list(map(int, ids)) for ids in input_ids],
        "checkpoint": checkpoint,
        "model_config": model_config or {},
        "max_new_tokens": max_new_tokens,
        "quant": quant,
        "seed": seed,
    }
    with tempfile.TemporaryDirectory(prefix="sink_eval_") as tmp:
        cfg_path = os.path.join(tmp, "config.json")
        out_path = os.path.join(tmp, "results.json")
        with open(cfg_path, "w") as f:
            json.dump(cfg, f)

        for platform in platforms:
            if os.path.exists(out_path):
                os.remove(out_path)  # stale-result cleanup
            env = dict(os.environ)
            if platform:
                env["JAX_PLATFORMS"] = platform
            if verbose:
                print(f"[subprocess_eval] launching worker "
                      f"(platform={platform or 'default'})", file=sys.stderr)
            try:
                proc = subprocess.run(
                    [sys.executable, "-c", _WORKER, cfg_path, out_path],
                    env=env, timeout=timeout, capture_output=True, text=True)
            except subprocess.TimeoutExpired:
                if verbose:
                    print("[subprocess_eval] worker timed out",
                          file=sys.stderr)
                continue
            if proc.returncode == 0 and os.path.exists(out_path):
                with open(out_path) as f:
                    return json.load(f)["generated_ids"]
            if verbose:
                print(f"[subprocess_eval] worker failed "
                      f"(rc={proc.returncode}):\n{proc.stderr[-2000:]}",
                      file=sys.stderr)
    return []
