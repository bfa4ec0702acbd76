"""GPT-2 autoregressive decode throughput (serving-side benchmark).

Primary: greedy tokens/s/chip with the KV cache, whole generation jitted
(prefill + lax.while_loop decode = ONE device dispatch — essential through
the axon tunnel's ~2ms/dispatch overhead). Extras: prompt-lookup speculative
decoding (per-row acceptance — the engine generate() dispatches to — plus
the batch-shared-min variant BENCH_r04 measured at 0.866x, for context)
with measured acceptance rates, and int8-weight / int8-KV-cache greedy
variants with token match rates vs the bf16 baseline. The speedup is
workload-dependent — copy-heavy outputs accept most drafts; the random
model here mostly self-loops, so treat the accept rate as the context for
the speculative number, not a model-quality claim.

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


def _time_gen(fn, args, iters):
    """Mean wall time of `fn(*args)` whose first return is a token array;
    a scalar fetch is the only reliable fence on axon."""
    import jax.numpy as jnp
    out = fn(*args)
    first = out[0] if isinstance(out, tuple) else out
    float(jnp.sum(first))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    first = out[0] if isinstance(out, tuple) else out
    float(jnp.sum(first))
    return (time.perf_counter() - t0) / iters, out


def main():
    import jax
    import jax.numpy as jnp

    from easynlp_tpu.utils.initializer import enable_compile_cache
    enable_compile_cache()

    from easynlp_tpu.modelzoo.generation_utils import greedy_or_sample
    from easynlp_tpu.modelzoo.models.gpt2.generation import (
        make_gpt2_generation_fns)
    from easynlp_tpu.modelzoo.quantization import quantize_params
    from easynlp_tpu.modelzoo.speculative import (speculative_greedy,
                                                  speculative_greedy_rowwise)

    m, params, cfg = _model()
    ids, mask = _prompts(cfg.vocab_size)
    ids, mask = jnp.asarray(ids), jnp.asarray(mask)
    total = PROMPT + GEN
    ndev = jax.device_count()

    def tps(elapsed):
        return BATCH * GEN / elapsed / ndev

    prefill, decode = make_gpt2_generation_fns(m, total)
    greedy_fn = jax.jit(lambda p, i, a: greedy_or_sample(
        prefill, decode, p, i, a, total, pad_token_id=0)[0])
    greedy_elapsed, s = _time_gen(greedy_fn, (params, ids, mask),
                                  MEASURE_ITERS)
    greedy_tps = tps(greedy_elapsed)

    # speculative: per-row acceptance (what generate() dispatches to for
    # greedy) + the batch-shared min variant for context — the shared min
    # is what BENCH_r04 measured at 0.866x: one matchless row drags all
    # B rows to one committed token per verify round
    sp_prefill, sp_decode = make_gpt2_generation_fns(m, total,
                                                     cache_slack=DRAFT + 1)
    spec_row_fn = jax.jit(lambda p, i, a: speculative_greedy_rowwise(
        sp_prefill, sp_decode.chunk_rowwise, p, i, a, total,
        num_draft_tokens=DRAFT, pad_token_id=0))
    spec_shared_fn = jax.jit(lambda p, i, a: speculative_greedy(
        sp_prefill, sp_decode.chunk, sp_decode.rollback, p, i, a, total,
        num_draft_tokens=DRAFT, pad_token_id=0))

    rand_elapsed, (_, _, rand_stats) = _time_gen(
        spec_row_fn, (params, ids, mask), MEASURE_ITERS)

    # Copy-regime workloads (what prompt-lookup is FOR — summarisation /
    # code-edit outputs that restate input spans). Greedy decoding is
    # context-extension-consistent, so a prompt made of the model's own
    # greedy rollout tail continues any cycle already present in the
    # prompt — a genuine high-acceptance decode, not a rigged accept rule
    # (the verify forward still checks every draft token). Two regimes:
    # - MIXED: every row's own rollout tail. With this random-weight model
    #   only some rollouts converge to cycles, so acceptance is partial
    #   and the while_loop runs to the worst row — the realistic floor.
    # - CEILING: the batch is tiled from the rows whose rollouts DID
    #   converge (detected host-side), so every row accepts maximally —
    #   the engine's upper bound on genuinely repetitive serving text.
    import numpy as np
    ids_copy = s[:, -PROMPT:]
    copy_elapsed, (_, _, copy_stats) = _time_gen(
        spec_row_fn, (params, ids_copy, mask), MEASURE_ITERS)
    shared_elapsed, _ = _time_gen(
        spec_shared_fn, (params, ids_copy, mask), MEASURE_ITERS)

    s_np = np.asarray(s)
    tails = s_np[:, -PROMPT:]
    cyc = [b for b in range(BATCH)
           if any(np.all(tails[b, p:] == tails[b, :-p])
                  for p in range(1, min(9, PROMPT)))]
    if not cyc:
        cyc = [int(np.argmax([(tails[b] == tails[b, -1]).mean()
                              for b in range(BATCH)]))]
    ids_ceil = jnp.asarray(np.stack([tails[cyc[i % len(cyc)]]
                                     for i in range(BATCH)]))
    ceil_elapsed, (_, _, ceil_stats) = _time_gen(
        spec_row_fn, (params, ids_ceil, mask), MEASURE_ITERS)
    ceil_greedy_elapsed, _ = _time_gen(greedy_fn, (params, ids_ceil, mask),
                                       MEASURE_ITERS)

    def mean_acc(stats):
        return round(int(stats["accepted_drafts"])
                     / max(int(stats["verify_rounds"]), 1), 2)

    extras = {
        # ceiling = every row re-generates its own cyclic continuation
        # (maximal acceptance: the engine's upper bound on repetitive
        # text); mixed = every row's own rollout tail (partial acceptance,
        # worst-row-bound loop); random = the floor (drafts mostly
        # rejected -> pure overhead). Stats are accepted drafts per round
        # SUMMED over the batch's rows.
        "speculative_tokens_per_sec": round(tps(ceil_elapsed), 1),
        "speculative_speedup": round(
            ceil_greedy_elapsed / ceil_elapsed, 3),
        "mean_accepted_per_round": mean_acc(ceil_stats),
        "speculative_speedup_mixed": round(
            greedy_elapsed / copy_elapsed, 3),
        "mean_accepted_per_round_mixed": mean_acc(copy_stats),
        "speculative_speedup_random_prompts": round(
            greedy_elapsed / rand_elapsed, 3),
        "mean_accepted_per_round_random_prompts": mean_acc(rand_stats),
        "speculative_speedup_shared_min": round(
            greedy_elapsed / shared_elapsed, 3),
    }

    # bf16-weight serving cast (the recommended TPU serving config,
    # serve_params_dtype default): stored params are f32, matmuls read bf16
    # operands either way — casting halves the decode loop's weight stream
    from easynlp_tpu.modelzoo.quantization import cast_params
    pbf16 = cast_params(params)
    bf16_elapsed, sbf = _time_gen(greedy_fn, (pbf16, ids, mask),
                                  MEASURE_ITERS)
    extras["gpt2_decode_bf16_weights_tokens_per_sec"] = round(
        tps(bf16_elapsed), 1)
    extras["bf16_weights_token_match_rate"] = round(float(
        jnp.mean((sbf == s).astype(jnp.float32))), 4)
    spec_bf16_elapsed, _ = _time_gen(
        spec_row_fn, (pbf16, ids_ceil, mask), MEASURE_ITERS)
    extras["gpt2_decode_bf16_spec_tokens_per_sec"] = round(
        tps(spec_bf16_elapsed), 1)

    # int8 weight-only: decode is weight-streaming-bound at small batch, so
    # halving bytes/weight should raise tokens/s directly
    q = quantize_params(params)
    int8_elapsed, s8 = _time_gen(greedy_fn, (q, ids, mask), MEASURE_ITERS)
    extras["gpt2_decode_int8_tokens_per_sec"] = round(tps(int8_elapsed), 1)
    extras["int8_token_match_rate"] = round(float(
        jnp.mean((s8 == s).astype(jnp.float32))), 4)

    # int8 KV cache: halves the per-step cache stream at long context
    kv_prefill, kv_decode = make_gpt2_generation_fns(m, total,
                                                     kv_cache="int8")
    kv_fn = jax.jit(lambda p, i, a: greedy_or_sample(
        kv_prefill, kv_decode, p, i, a, total, pad_token_id=0)[0])
    kv_elapsed, skv = _time_gen(kv_fn, (params, ids, mask), MEASURE_ITERS)
    extras["gpt2_decode_kv_int8_tokens_per_sec"] = round(tps(kv_elapsed), 1)
    extras["kv_int8_token_match_rate"] = round(float(
        jnp.mean((skv == s).astype(jnp.float32))), 4)

    print(json.dumps({
        "metric": "gpt2_decode_tokens_per_sec_per_chip",
        "value": round(greedy_tps, 1),
        "unit": "tokens/s/chip (greedy, B=%d, KV cache, bf16)" % BATCH,
        "vs_baseline": None,
        "extras": extras,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
