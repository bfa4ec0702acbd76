"""GPT-2 autoregressive decode throughput (serving-side benchmark).

Primary: greedy tokens/s/chip with the KV cache, whole generation jitted
(prefill + lax.while_loop decode = ONE device dispatch — essential through
the axon tunnel's ~2ms/dispatch overhead). Extras: prompt-lookup speculative
decoding on the same inputs with its measured acceptance rate (the speedup
is workload-dependent — copy-heavy outputs accept most drafts; the random
model here mostly self-loops, so treat the accept rate as the context for
the speculative number, not a model-quality claim).

BENCH_TINY=1 shrinks everything for CPU smoke runs.
"""

import json
import os
import sys
import time

TINY = bool(int(os.environ.get("BENCH_TINY", "0")))

if os.environ.get("BENCH_PLATFORM"):
    import jax
    jax.config.update("jax_platforms", os.environ["BENCH_PLATFORM"])

BATCH = 8 if not TINY else 2
PROMPT = 64 if not TINY else 8
GEN = 128 if not TINY else 8
DRAFT = 8 if not TINY else 4
MEASURE_ITERS = 3 if not TINY else 1


def _model():
    import jax
    import jax.numpy as jnp

    from easynlp_tpu.modelzoo.models.gpt2 import GPT2Config, GPT2LMHeadModel
    if TINY:
        cfg = GPT2Config(vocab_size=128, n_positions=64, n_embd=32,
                         n_layer=2, n_head=2, resid_pdrop=0.0,
                         embd_pdrop=0.0, attn_pdrop=0.0)
    else:
        # gpt2-base dims: the smallest realistic serving decode workload
        cfg = GPT2Config(vocab_size=50257, n_positions=1024, n_embd=768,
                         n_layer=12, n_head=12, resid_pdrop=0.0,
                         embd_pdrop=0.0, attn_pdrop=0.0)
    m = GPT2LMHeadModel.from_config(cfg, dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    params = m.init({"params": rng, "dropout": rng},
                    input_ids=jnp.ones((1, 4), jnp.int32),
                    deterministic=True)["params"]
    from flax import linen as nn
    return m, nn.unbox(params), cfg


def _prompts(vocab_size):
    import numpy as np
    rng = np.random.RandomState(0)
    # half repetitive (lookup-friendly), half irregular
    rows = []
    for b in range(BATCH):
        if b % 2 == 0:
            pat = rng.randint(1, vocab_size, 4)
            row = np.tile(pat, PROMPT // 4 + 1)[:PROMPT]
        else:
            row = rng.randint(1, vocab_size, PROMPT)
        rows.append(row)
    ids = np.stack(rows).astype(np.int32)
    mask = np.ones_like(ids)
    return ids, mask


def main():
    import jax
    import jax.numpy as jnp

    from easynlp_tpu.utils.initializer import enable_compile_cache
    enable_compile_cache()

    from easynlp_tpu.modelzoo.generation_utils import greedy_or_sample
    from easynlp_tpu.modelzoo.models.gpt2.generation import (
        make_gpt2_generation_fns)
    from easynlp_tpu.modelzoo.speculative import speculative_greedy

    m, params, cfg = _model()
    ids, mask = _prompts(cfg.vocab_size)
    ids, mask = jnp.asarray(ids), jnp.asarray(mask)
    total = PROMPT + GEN

    prefill, decode = make_gpt2_generation_fns(m, total)
    greedy_fn = jax.jit(lambda p, i, a: greedy_or_sample(
        prefill, decode, p, i, a, total, pad_token_id=0)[0])
    s = greedy_fn(params, ids, mask)
    s.block_until_ready()
    float(jnp.sum(s))  # scalar fetch: the only reliable fence on axon
    t0 = time.perf_counter()
    for _ in range(MEASURE_ITERS):
        s = greedy_fn(params, ids, mask)
    float(jnp.sum(s))
    greedy_elapsed = (time.perf_counter() - t0) / MEASURE_ITERS
    greedy_tps = BATCH * GEN / greedy_elapsed / jax.device_count()

    sp_prefill, sp_decode = make_gpt2_generation_fns(m, total,
                                                     cache_slack=DRAFT + 1)
    spec_fn = jax.jit(lambda p, i, a: speculative_greedy(
        sp_prefill, sp_decode.chunk, sp_decode.rollback, p, i, a, total,
        num_draft_tokens=DRAFT, pad_token_id=0))
    s2, _, stats = spec_fn(params, ids, mask)
    float(jnp.sum(s2))
    t0 = time.perf_counter()
    for _ in range(MEASURE_ITERS):
        s2, _, stats = spec_fn(params, ids, mask)
    float(jnp.sum(s2))
    spec_elapsed = (time.perf_counter() - t0) / MEASURE_ITERS
    spec_tps = BATCH * GEN / spec_elapsed / jax.device_count()
    rounds = max(int(stats["verify_rounds"]), 1)
    accepted = int(stats["accepted_drafts"])

    # Copy-regime workload (what prompt-lookup is FOR — summarisation /
    # code-edit outputs that restate input spans). Greedy decoding is
    # context-extension-consistent, so a prompt made of the model's own
    # greedy rollout tail continues with a cycle already present in the
    # prompt — a genuine high-acceptance decode, not a rigged accept rule
    # (the verify forward still checks every draft token).
    ids_copy = s[:, -PROMPT:]
    s3, _, stats_c = spec_fn(params, ids_copy, mask)
    float(jnp.sum(s3))
    t0 = time.perf_counter()
    for _ in range(MEASURE_ITERS):
        s3, _, stats_c = spec_fn(params, ids_copy, mask)
    float(jnp.sum(s3))
    copy_elapsed = (time.perf_counter() - t0) / MEASURE_ITERS
    copy_tps = BATCH * GEN / copy_elapsed / jax.device_count()
    rounds_c = max(int(stats_c["verify_rounds"]), 1)
    accepted_c = int(stats_c["accepted_drafts"])

    print(json.dumps({
        "metric": "gpt2_decode_tokens_per_sec_per_chip",
        "value": round(greedy_tps, 1),
        "unit": "tokens/s/chip (greedy, B=%d, KV cache, bf16)" % BATCH,
        "vs_baseline": None,
        "extras": {
            # copy-heavy regime = the target workload; random regime is the
            # acceptance floor (drafts mostly rejected -> pure overhead)
            "speculative_tokens_per_sec": round(copy_tps, 1),
            "speculative_speedup": round(copy_tps / greedy_tps, 3),
            "mean_accepted_per_round": round(accepted_c / rounds_c, 2),
            "speculative_speedup_random_prompts": round(
                spec_tps / greedy_tps, 3),
            "mean_accepted_per_round_random_prompts": round(
                accepted / rounds, 2),
        },
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
