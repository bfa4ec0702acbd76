"""Continuous-batching decode benchmark: mixed-length generation workload
through the ContinuousBatcher vs sequential coalesced batches.

The workload is the shape continuous batching exists for: concurrent
requests whose generation lengths differ a lot. Coalesce-then-generate
holds every request until the batch's LONGEST generation finishes
(wall-clock ~ sum of per-batch maxima); the slot scheduler retires short
requests early and refills their slots (wall-clock ~ total tokens /
throughput). Reported uplift is end-to-end completion time for the same
request set.

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

SLOTS = 8 if not TINY else 2
N_REQ = 32 if not TINY else 6
PROMPT = 32 if not TINY else 6
# KV window provisioned to the workload (prompt 32 + max gen 128, padded
# to the next 64 multiple): attention in the slot paths costs O(MAX_LEN)
# per step regardless of occupancy, so an oversized window taxes every
# decoded token — an operator sizes it to the admitted request class,
# exactly like max_model_len in any slot-based server.
MAX_LEN = 192 if not TINY else 24
# mixed generation lengths: short tail + a few long stragglers
GEN_SHORT = 16 if not TINY else 3
GEN_LONG = 128 if not TINY else 10


def _model():
    import jax
    import jax.numpy as jnp

    from easynlp_tpu.modelzoo.models.gpt2 import GPT2Config, GPT2LMHeadModel
    if TINY:
        cfg = GPT2Config(vocab_size=128, n_positions=64, n_embd=32,
                         n_layer=2, n_head=2, resid_pdrop=0.0,
                         embd_pdrop=0.0, attn_pdrop=0.0)
    else:
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


def _requests(vocab_size):
    import numpy as np
    rng = np.random.RandomState(0)
    reqs = []
    for i in range(N_REQ):
        ids = rng.randint(1, vocab_size, PROMPT).tolist()
        gen = GEN_LONG if i % 4 == 0 else GEN_SHORT
        reqs.append((ids, gen))
    return reqs


def bench_continuous(m, params, reqs):
    from easynlp_tpu.serving.continuous import ContinuousBatcher
    b = ContinuousBatcher(m, params, max_slots=SLOTS, max_length=MAX_LEN,
                          prompt_buckets=(PROMPT,), pad_token_id=0,
                          chunk_size=16 if not TINY else 4)
    try:
        # warmup compiles (prefill bucket + step)
        b.submit(reqs[0][0], max_new_tokens=2).result(timeout=600)
        t0 = time.perf_counter()
        handles = [b.submit(ids, max_new_tokens=g) for ids, g in reqs]
        total = sum(len(h.result(timeout=1200)) for h in handles)
        elapsed = time.perf_counter() - t0
    finally:
        b.stop()
    return total, elapsed


def bench_device_decoder(m, params, reqs):
    """Same workload through DeviceContinuousDecoder: the whole mixed-
    length set (admission, decode, retirement, refill) in ONE jitted
    while_loop — one dispatch total, so the host link latency (dominant
    through a tunneled TPU) drops out entirely."""
    from easynlp_tpu.serving.continuous import DeviceContinuousDecoder
    dec = DeviceContinuousDecoder(
        m, params, max_slots=SLOTS, max_length=MAX_LEN,
        prompt_bucket=PROMPT, pad_token_id=0,
        chunk_size=16 if not TINY else 4)
    prompts = [ids for ids, _ in reqs]
    budgets = [g for _, g in reqs]
    outs = dec(prompts, budgets)  # warmup = compile
    t0 = time.perf_counter()
    outs = dec(prompts, budgets)
    elapsed = time.perf_counter() - t0
    return sum(len(o) for o in outs), elapsed, outs


def bench_device_decoder_spec(m, params, reqs):
    """Speculative variant: prompt-lookup drafts + [SLOTS, K+1] verify
    inside the same while_loop. Token-exact vs the plain decoder; the
    tokens/forward gain tracks how repetitive the greedy stream is (real
    copy-heavy serving — summarization/dialogue/code — accepts most
    drafts; this synthetic workload's acceptance comes from greedy
    attractor loops and is reported alongside)."""
    from easynlp_tpu.serving.continuous import DeviceContinuousDecoder
    dec = DeviceContinuousDecoder(
        m, params, max_slots=SLOTS, max_length=MAX_LEN + 8,
        prompt_bucket=PROMPT, pad_token_id=0,
        speculative=(2, 4))
    prompts = [ids for ids, _ in reqs]
    budgets = [g for _, g in reqs]
    dec(prompts, budgets)  # warmup = compile
    t0 = time.perf_counter()
    outs = dec(prompts, budgets)
    elapsed = time.perf_counter() - t0
    stats = dec.last_spec_stats or {}
    rounds = max(stats.get("verify_rounds", 0), 1)
    per_round = stats.get("tokens_committed_in_rounds", 0) / rounds
    return sum(len(o) for o in outs), elapsed, per_round


def bench_device_decoder_spec_ceiling(m, params, reqs, ref_outs):
    """Speculative continuous decoding in its FAVORABLE regime: requests
    whose prompts are cyclic rollout tails (each row re-generates its own
    repetitive continuation, so prompt-lookup accepts maximally). The
    mixed-random request set above is the floor; this is the ceiling —
    real copy-heavy serving (summarization, dialogue, code) sits between.
    Returns (spec_tokens/s, plain_tokens/s on the same requests,
    committed-per-round)."""
    import numpy as np

    from easynlp_tpu.serving.continuous import DeviceContinuousDecoder
    full = [list(ids) + list(out)
            for (ids, _), out in zip(reqs, ref_outs)]
    tails = [row[-PROMPT:] for row in full]
    # only LONG-budget rollouts can demonstrate convergence to a cycle;
    # require a period <= 8 over their last 32 tokens (short outputs match
    # spuriously and their tails don't actually continue cyclically)
    cyc = []
    for i, ((_, g), out) in enumerate(zip(reqs, ref_outs)):
        o = np.asarray(out[-32:])
        if (g >= GEN_LONG and len(o) >= 32
                and any(np.all(o[p:] == o[:-p]) for p in range(1, 9))):
            cyc.append(i)
    if not cyc:
        cyc = [0]
    prompts = [tails[cyc[i % len(cyc)]] for i in range(N_REQ)]
    budgets = [g for _, g in reqs]

    plain = DeviceContinuousDecoder(
        m, params, max_slots=SLOTS, max_length=MAX_LEN + 8,
        prompt_bucket=PROMPT, pad_token_id=0,
        chunk_size=16 if not TINY else 4)
    plain(prompts, budgets)
    t0 = time.perf_counter()
    pouts = plain(prompts, budgets)
    plain_s = time.perf_counter() - t0

    dec = DeviceContinuousDecoder(
        m, params, max_slots=SLOTS, max_length=MAX_LEN + 16,
        prompt_bucket=PROMPT, pad_token_id=0,
        speculative=(2, 8 if not TINY else 4))
    dec(prompts, budgets)
    t0 = time.perf_counter()
    outs = dec(prompts, budgets)
    elapsed = time.perf_counter() - t0
    stats = dec.last_spec_stats or {}
    rounds = max(stats.get("verify_rounds", 0), 1)
    per_round = stats.get("tokens_committed_in_rounds", 0) / rounds
    return (sum(len(o) for o in outs) / elapsed,
            sum(len(o) for o in pouts) / plain_s, per_round)


def bench_device_decoder_int8(m, params, reqs, ref_outs):
    """Plain device decoder with int8 weight-only params: decode is
    weight-streaming-bound, so halving bytes/weight raises tokens/s;
    the token match rate vs the bf16 run bounds the rounding cost."""
    from easynlp_tpu.modelzoo.quantization import quantize_params
    from easynlp_tpu.serving.continuous import DeviceContinuousDecoder
    q = quantize_params(params)
    dec = DeviceContinuousDecoder(
        m, q, max_slots=SLOTS, max_length=MAX_LEN,
        prompt_bucket=PROMPT, pad_token_id=0,
        chunk_size=16 if not TINY else 4)
    prompts = [ids for ids, _ in reqs]
    budgets = [g for _, g in reqs]
    dec(prompts, budgets)  # warmup = compile
    t0 = time.perf_counter()
    outs = dec(prompts, budgets)
    elapsed = time.perf_counter() - t0
    matched = total = 0
    for o, r in zip(outs, ref_outs):
        total += len(r)
        matched += sum(1 for a, b in zip(o, r) if a == b)
    return sum(len(o) for o in outs), elapsed, matched / max(total, 1)


PREFIX_LEN = 192 if not TINY else 8


def bench_shared_prefix(m, params, reqs):
    """Shared-prefix KV caching in its NATIVE regime: a long system prompt
    (PREFIX_LEN tokens) over SHORT generations — the few-shot-classify /
    tool-call serving shape where re-prefilling the prefix per request is
    the dominant cost. A 64-token prefix under 128-token generations
    measured ~1.0x (decode steps dominate); the feature exists for the
    opposite ratio. Same suffixes/budgets both sides; speedup =
    full-prompt wall / suffix-only wall."""
    import numpy as np

    from easynlp_tpu.serving.continuous import DeviceContinuousDecoder
    rng = np.random.RandomState(7)
    prefix = rng.randint(1, 1000, PREFIX_LEN).tolist()
    suffixes = [ids for ids, _ in reqs]
    budgets = [GEN_SHORT] * len(reqs)
    window = PREFIX_LEN + PROMPT + GEN_SHORT + 8

    full = DeviceContinuousDecoder(
        m, params, max_slots=SLOTS, max_length=window,
        prompt_bucket=PREFIX_LEN + PROMPT, pad_token_id=0,
        chunk_size=16 if not TINY else 4)
    full_prompts = [prefix + s for s in suffixes]
    full(full_prompts, budgets)  # warmup = compile
    t0 = time.perf_counter()
    full(full_prompts, budgets)
    full_s = time.perf_counter() - t0

    pfx = DeviceContinuousDecoder(
        m, params, max_slots=SLOTS, max_length=window,
        prompt_bucket=PROMPT, pad_token_id=0,
        chunk_size=16 if not TINY else 4, shared_prefix=prefix)
    pfx(suffixes, budgets)  # warmup = compile
    t0 = time.perf_counter()
    pfx(suffixes, budgets)
    pfx_s = time.perf_counter() - t0
    return round(full_s / pfx_s, 3)


def bench_latency(m, params, reqs, closed_loop_s):
    """Open-loop latency SLOs on the streaming thread batcher: requests
    arrive on a fixed schedule at ~90% of the measured closed-loop
    completion rate; per-request we record time-to-first-token (the
    streaming path's responsiveness) and full completion latency.
    Returns p50/p99 of both in ms (N_REQ samples, so p99 ~ max)."""
    import threading

    from easynlp_tpu.serving.continuous import ContinuousBatcher
    b = ContinuousBatcher(m, params, max_slots=SLOTS, max_length=MAX_LEN,
                          prompt_buckets=(PROMPT,), pad_token_id=0,
                          chunk_size=16 if not TINY else 4)
    lat, ttft = [None] * len(reqs), [None] * len(reqs)
    try:
        b.submit(reqs[0][0], max_new_tokens=2).result(timeout=600)
        interval = closed_loop_s / len(reqs) / 0.9
        threads = []

        def consume(i, handle, t_submit):
            first = True
            for _ in handle.iter_tokens(timeout=1200):
                if first:
                    ttft[i] = time.perf_counter() - t_submit
                    first = False
            lat[i] = time.perf_counter() - t_submit

        t_start = time.perf_counter()
        for i, (ids, g) in enumerate(reqs):
            target = t_start + i * interval
            now = time.perf_counter()
            if target > now:
                time.sleep(target - now)
            t_submit = time.perf_counter()
            h = b.submit(ids, max_new_tokens=g, stream=True)
            th = threading.Thread(target=consume, args=(i, h, t_submit),
                                  daemon=True)
            th.start()
            threads.append(th)
        for th in threads:
            th.join(timeout=1200)
    finally:
        b.stop()

    def pct(xs, q):
        xs = sorted(x for x in xs if x is not None)
        if not xs:
            return None
        idx = min(int(round(q * (len(xs) - 1))), len(xs) - 1)
        return round(xs[idx] * 1000.0, 1)

    return {
        "serve_p50_latency_ms": pct(lat, 0.50),
        "serve_p99_latency_ms": pct(lat, 0.99),
        "serve_p50_ttft_ms": pct(ttft, 0.50),
        "serve_p99_ttft_ms": pct(ttft, 0.99),
    }


def bench_coalesced(m, params, reqs):
    """Sequential SLOTS-wide batches; each batch decodes to its max gen."""
    import jax
    import jax.numpy as jnp

    from easynlp_tpu.modelzoo.generation_utils import (greedy_or_sample,
                                                       left_pad)
    from easynlp_tpu.modelzoo.models.gpt2.generation import (
        make_gpt2_generation_fns)

    fns = {}

    def run_batch(batch):
        gen = max(g for _, g in batch)
        total = PROMPT + gen
        if total not in fns:
            prefill, decode = make_gpt2_generation_fns(m, total)
            fns[total] = jax.jit(lambda p, i, a, _pf=prefill, _dc=decode,
                                 _t=total: greedy_or_sample(
                                     _pf, _dc, p, i, a, _t,
                                     pad_token_id=0)[0])
        rows = [ids for ids, _ in batch]
        while len(rows) < SLOTS:
            rows.append(rows[-1])
        pids, pmask = left_pad(rows, pad_token_id=0, length=PROMPT)
        out = fns[total](params, jnp.asarray(pids), jnp.asarray(pmask))
        out.block_until_ready()
        return sum(g for _, g in batch)

    # warmup both compile shapes
    run_batch(reqs[:SLOTS])
    short_only = [r for r in reqs if r[1] == GEN_SHORT][:SLOTS]
    run_batch(short_only)
    t0 = time.perf_counter()
    total = 0
    for start in range(0, len(reqs), SLOTS):
        total += run_batch(reqs[start:start + SLOTS])
    elapsed = time.perf_counter() - t0
    return total, elapsed


def main():
    from easynlp_tpu.utils.initializer import enable_compile_cache
    enable_compile_cache()
    m, params, cfg = _model()
    reqs = _requests(cfg.vocab_size)
    t_leg0 = time.perf_counter()
    # optional sub-benches run inside the remaining leg budget (the
    # orchestrator's per-leg timeout is 900s; a skipped extra is a note,
    # a timed-out leg loses EVERYTHING)
    budget = float(os.environ.get("BENCH_CONT_BUDGET", "780"))

    def left():
        return budget - (time.perf_counter() - t_leg0)

    cont_tokens, cont_s = bench_continuous(m, params, reqs)
    dev_tokens, dev_s, dev_outs = bench_device_decoder(m, params, reqs)
    spec_tokens, spec_s, spec_acc = bench_device_decoder_spec(m, params,
                                                              reqs)
    coal_tokens, coal_s = bench_coalesced(m, params, reqs)
    opt = {}
    if left() > 150:
        ceil_tps, ceil_plain_tps, ceil_acc = \
            bench_device_decoder_spec_ceiling(m, params, reqs, dev_outs)
        opt["speculative_ceiling_tokens_per_sec"] = round(ceil_tps, 1)
        opt["speculative_ceiling_over_plain"] = round(
            ceil_tps / ceil_plain_tps, 3)
        opt["speculative_ceiling_tokens_per_verify_round"] = round(
            ceil_acc, 2)
    else:
        opt["speculative_ceiling_skipped"] = "leg budget"
    if left() > 120:
        int8_tokens, int8_s, int8_match = bench_device_decoder_int8(
            m, params, reqs, dev_outs)
        opt["int8_tokens_per_sec"] = round(int8_tokens / int8_s, 1)
        opt["int8_token_match_rate"] = round(int8_match, 4)
    else:
        opt["int8_skipped"] = "leg budget"
    if left() > 90 + 1.5 * cont_s:
        opt.update(bench_latency(m, params, reqs, cont_s))
    else:
        opt["latency_skipped"] = "leg budget"
    if left() > 180:
        opt["shared_prefix_speedup"] = bench_shared_prefix(m, params, reqs)
    else:
        opt["shared_prefix_skipped"] = "leg budget"
    # Primary = the device-resident decoder: it IS continuous batching
    # (admission / retirement / refill), just scheduled in-graph, and it is
    # the framework's recommended path for offline mixed-length workloads.
    # The thread batcher (online streaming arrivals) pays a host round-trip
    # per chunk, which through the sandbox's tunneled TPU is latency-bound
    # — reported in extras for the same workload.
    print(json.dumps({
        "metric": "continuous_batching_tokens_per_sec",
        "value": round(dev_tokens / dev_s, 1),
        "unit": "tokens/s (%d reqs, %d slots, mixed %d/%d gen)"
                % (N_REQ, SLOTS, GEN_SHORT, GEN_LONG),
        "vs_baseline": None,
        "extras": {
            "coalesced_tokens_per_sec": round(coal_tokens / coal_s, 1),
            "completion_speedup": round(coal_s / dev_s, 3),
            "online_batcher_tokens_per_sec": round(cont_tokens / cont_s, 1),
            "online_batcher_over_coalesced": round(coal_s / cont_s, 3),
            "speculative_tokens_per_sec": round(spec_tokens / spec_s, 1),
            "speculative_over_plain": round(dev_s / spec_s, 3),
            "speculative_tokens_per_verify_round": round(spec_acc, 2),
            **opt,
        },
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
