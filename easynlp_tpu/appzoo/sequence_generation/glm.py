"""GLM blank-infilling finetuning + generation.

Capability parity: reference easynlp/modelzoo/mg_utils/finetune_glm.py:304
(seq2seq finetuning: source Part A ends in [gMASK], the answer decodes as
Part B behind [sop] with (mask-position, 1..N) two-dimensional positions)
— here as an app over GLMForConditionalGeneration with a static KV-cache
decode loop through the shared generation engine."""

import jax
import jax.numpy as jnp
import numpy as np

from easynlp_tpu.appzoo.application import Application
from easynlp_tpu.data.dataset import BaseDataset
from easynlp_tpu.modelzoo.models.glm.modeling_glm import (
    GLMConfig,
    GLMForConditionalGeneration,
)
from easynlp_tpu.utils import losses

IGNORE = -100


class GLMSequenceGenerationDataset(BaseDataset):
    """Rows 'src<TAB>tgt' → the GLM cloze layout
    [src…, gMASK, sop, tgt…, eop] with 2D positions: Part A positions
    0..n, blocks 0; Part B position = gMASK index, blocks 1..N."""

    def __init__(self, data_file, tokenizer, max_seq_length=128,
                 max_target_length=32, input_schema=None, first_sequence=None,
                 second_sequence=None, label_name=None,
                 user_defined_parameters=None, **kwargs):
        for k in ("label_enumerate_values", "multi_label", "is_training",
                  "image_size"):
            kwargs.pop(k, None)
        super().__init__(data_file, input_schema=input_schema, **kwargs)
        udp = user_defined_parameters or {}
        self.tokenizer = tokenizer
        self.src_len = int(udp.get("src_len",
                                   max_seq_length - max_target_length - 2))
        self.tgt_len = int(udp.get("tgt_len", max_target_length))
        self.src_col = first_sequence
        self.tgt_col = second_sequence or label_name
        self.gmask_id = int(udp.get("gmask_id", getattr(
            tokenizer, "gmask_token_id", 1)))
        self.sop_id = int(udp.get("sop_id", getattr(
            tokenizer, "sop_token_id", 2)))
        self.eop_id = int(udp.get("eop_id", getattr(
            tokenizer, "eop_token_id", 3)))
        self.pad_id = int(udp.get("pad_id",
                                  getattr(tokenizer, "pad_token_id", 0)))
        self._build_features()

    def _encode(self, text, limit):
        ids = self.tokenizer(
            [str(text)], max_length=limit)["input_ids"][0]
        return [t for t in ids if t != self.pad_id][:limit]

    def _build_features(self):
        s_total = self.src_len + 1 + 1 + self.tgt_len + 1
        rows = []
        for row in self.rows:
            r = self.parse_row(row)
            src = self._encode(r.get(self.src_col, ""), self.src_len)
            tgt = self._encode(r.get(self.tgt_col, ""), self.tgt_len) \
                if self.tgt_col else []
            n = len(src)
            part_a = src + [self.gmask_id]
            part_b = [self.sop_id] + tgt + [self.eop_id]
            ids = part_a + part_b
            pos = list(range(len(part_a))) + [n] * len(part_b)
            blocks = [0] * len(part_a) + list(range(1, len(part_b) + 1))
            labels = [IGNORE] * len(part_a) + tgt + [self.eop_id] + [IGNORE]
            # labels[i] = token position i should PREDICT (next-token over
            # Part B: sop→tgt0, …, tgt_last→eop)
            labels = labels[:len(ids)]
            pad = s_total - len(ids)
            rows.append({
                "input_ids": ids + [self.pad_id] * pad,
                "attention_mask": [1] * len(ids) + [0] * pad,
                "position_ids": pos + [0] * pad,
                "block_position_ids": blocks + [0] * pad,
                "labels": labels + [IGNORE] * pad,
                "prefix_lengths": len(part_a),
            })
        self.features = {
            k: np.asarray([r[k] for r in rows], np.int32) for k in rows[0]}

    def __len__(self):
        return len(self.rows)

    def __getitem__(self, idx):
        return {k: v[idx] for k, v in self.features.items()}

    def batch_fn(self, examples):
        return {k: np.stack([e[k] for e in examples]) for k in examples[0]}


def make_glm_generation_fns(module, max_length, cache_dtype=None,
                            cache_slack=0):
    """(prefill, decode) for prompts laid out [pad…, src, gMASK, sop]
    (LEFT-padded). Part B positions: position_id = the gMASK position,
    block_position_id = 1, 2, … (reference finetune_glm sampling).
    cache_slack: extra KV slots for speculative verify chunks."""

    def prefill(params, input_ids, attention_mask):
        b, p = input_ids.shape
        cache = module.init_cache(b, max_length + cache_slack,
                                  dtype=cache_dtype)
        cache["mask"] = jax.lax.dynamic_update_slice(
            cache["mask"], attention_mask.astype(jnp.int32), (0, 0))
        counts = attention_mask.sum(-1)            # n + 2 (gmask + sop)
        mask_pos = counts - 2                      # position id of gMASK
        pos = jnp.maximum(jnp.cumsum(attention_mask, -1) - 1, 0)
        rev = jnp.cumsum(attention_mask[:, ::-1], -1)[:, ::-1]
        is_sop = (rev == 1) & (attention_mask > 0)  # last real slot
        positions = jnp.where(is_sop, mask_pos[:, None], pos)
        blocks = jnp.where(is_sop, 1, 0)
        cache["glm_mask_pos"] = mask_pos.astype(jnp.int32)
        cache["glm_prompt_len"] = jnp.full((b,), p, jnp.int32)
        out = module.apply(
            {"params": params}, input_ids=input_ids,
            position_ids=positions, block_position_ids=blocks,
            prefix_lengths=jnp.full((b,), p - 1, jnp.int32),
            cache={k: cache[k] for k in ("k", "v", "index", "mask")},
            deterministic=True)
        new_cache = dict(out["cache"])
        new_cache["glm_mask_pos"] = cache["glm_mask_pos"]
        new_cache["glm_prompt_len"] = cache["glm_prompt_len"]
        return out["logits"][:, -1].astype(jnp.float32), new_cache

    def decode(params, token, cache):
        b = token.shape[0]
        idx = cache["index"]
        cache = dict(cache)
        cache["mask"] = jax.lax.dynamic_update_slice(
            cache["mask"], jnp.ones((b, 1), jnp.int32), (0, idx))
        positions = cache["glm_mask_pos"][:, None]
        blocks = (idx - cache["glm_prompt_len"] + 2)[:, None]
        out = module.apply(
            {"params": params}, input_ids=token, position_ids=positions,
            block_position_ids=blocks,
            prefix_lengths=cache["glm_prompt_len"] - 1,
            cache={k: cache[k] for k in ("k", "v", "index", "mask")},
            deterministic=True)
        new_cache = dict(out["cache"])
        new_cache["glm_mask_pos"] = cache["glm_mask_pos"]
        new_cache["glm_prompt_len"] = cache["glm_prompt_len"]
        return out["logits"][:, -1].astype(jnp.float32), new_cache

    def decode_chunk(params, tokens, cache):
        """Speculative verify chunk: the GLM cached bias already encodes
        intra-chunk causality per query position (modeling_glm.py:199-206);
        Part B 2D positions extend per chunk offset."""
        b, s = tokens.shape
        idx = cache["index"]
        cache = dict(cache)
        cache["mask"] = jax.lax.dynamic_update_slice(
            cache["mask"], jnp.ones((b, s), jnp.int32), (0, idx))
        positions = jnp.broadcast_to(cache["glm_mask_pos"][:, None], (b, s))
        blocks = (idx + jnp.arange(s))[None, :] \
            - cache["glm_prompt_len"][:, None] + 2
        out = module.apply(
            {"params": params}, input_ids=tokens, position_ids=positions,
            block_position_ids=blocks,
            prefix_lengths=cache["glm_prompt_len"] - 1,
            cache={k: cache[k] for k in ("k", "v", "index", "mask")},
            deterministic=True)
        new_cache = dict(out["cache"])
        new_cache["glm_mask_pos"] = cache["glm_mask_pos"]
        new_cache["glm_prompt_len"] = cache["glm_prompt_len"]
        return out["logits"].astype(jnp.float32), new_cache

    def rollback(cache, drop):
        new_index = cache["index"] - drop
        t = cache["mask"].shape[1]
        mask = jnp.where(jnp.arange(t)[None, :] >= new_index, 0,
                         cache["mask"])
        return dict(cache, index=new_index, mask=mask)

    def reindex_cache(cache, flat_beam):
        return {
            "k": jnp.take(cache["k"], flat_beam, axis=1),
            "v": jnp.take(cache["v"], flat_beam, axis=1),
            "mask": jnp.take(cache["mask"], flat_beam, axis=0),
            "index": cache["index"],
            "glm_mask_pos": jnp.take(cache["glm_mask_pos"], flat_beam, 0),
            "glm_prompt_len": jnp.take(cache["glm_prompt_len"], flat_beam,
                                       0),
        }

    prefill.reindex_cache = reindex_cache
    decode.chunk = decode_chunk
    decode.rollback = rollback
    decode.cache_slack = cache_slack  # validated by the speculative path
    return prefill, decode


class GLMSequenceGeneration(Application):
    model_input_keys = ("input_ids", "position_ids", "block_position_ids",
                        "prefix_lengths", "attention_mask")

    def sample_inputs(self):
        return {"input_ids": jnp.ones((1, 8), jnp.int32)}

    @staticmethod
    def loss_fn(outputs, batch):
        return {"loss": losses.cross_entropy(outputs["logits"],
                                             batch["labels"],
                                             ignore_index=IGNORE)}

    @classmethod
    def load_config(cls, model_dir, **kwargs):
        return GLMConfig.from_pretrained(model_dir)

    @classmethod
    def build_module(cls, config, args=None, dtype=jnp.float32, **kwargs):
        remat = getattr(args, "remat", "none") if args else "none"
        return GLMForConditionalGeneration(config=config, dtype=dtype,
                                           remat=remat)

    @classmethod
    def convert_pytorch_state_dict(cls, state_dict, config):
        from easynlp_tpu.modelzoo.models.glm.conversion import convert_glm
        return {"glm": convert_glm(state_dict, config)}

    def stream_logits(self, input_ids, attention_mask=None,
                      segment_length=64, mem_length=None):
        """Long-context causal scoring with Transformer-XL segment memories
        (reference --mem-length, mg_utils/train_utils.py:325-334 /
        mpu_transformer.py:854-867): the sequence streams through ONE
        compiled segment forward, each segment attending to the last
        `mem_length` positions of prior segments via layer-input memories.
        Reproduces a mem-trained reference GLM checkpoint's inference
        behavior; returns [B, T, V] logits (T padded up to a segment
        multiple is the caller's concern — T must divide by
        segment_length)."""
        import jax

        ids = jnp.asarray(input_ids)
        b, t = ids.shape
        if t % segment_length:
            raise ValueError("sequence length %d must divide into "
                             "segment_length %d" % (t, segment_length))
        mem_length = int(mem_length if mem_length is not None
                         else getattr(self.config, "max_memory_length", 0)
                         or segment_length)
        mask = jnp.asarray(attention_mask) if attention_mask is not None \
            else jnp.ones((b, t), jnp.int32)
        mems = self.module.init_mems(b, mem_length)

        @jax.jit
        def seg_fn(params, seg_ids, seg_mask, offset, mems):
            pos = offset + jnp.arange(seg_ids.shape[1])[None]
            out = self.module.apply(
                {"params": params}, input_ids=seg_ids,
                position_ids=jnp.broadcast_to(pos, seg_ids.shape),
                block_position_ids=jnp.zeros_like(seg_ids),
                prefix_lengths=jnp.zeros((b,), jnp.int32),
                attention_mask=seg_mask, mems=mems, deterministic=True)
            return out["logits"].astype(jnp.float32), out["mems"]

        chunks = []
        for off in range(0, t, segment_length):
            seg_logits, mems = seg_fn(
                self.params, ids[:, off:off + segment_length],
                mask[:, off:off + segment_length],
                jnp.int32(off), mems)
            chunks.append(seg_logits)
        return jnp.concatenate(chunks, axis=1)

    def generate(self, src_ids, src_mask, max_length=32, gmask_id=1,
                 sop_id=2, eop_id=3, pad_id=0, num_beams=1, do_sample=False,
                 **kwargs):
        """Blank-infilling generation: left-pad [src, gMASK, sop] prompts
        and decode Part B with the static cache.

        gmask_id/sop_id/eop_id/pad_id MUST be the tokenizer's real ids for a
        real checkpoint (GLMTokenizer derives them from the vocab — they are
        never the 1/2/3/0 literals); the predictor and evaluator forward
        them from the tokenizer automatically."""
        from easynlp_tpu.modelzoo.generation_utils import generate, left_pad
        if kwargs.pop("kv_cache", None):
            from easynlp_tpu.utils.logger import logger
            logger.warning("kv_cache_dtype is not supported for the GLM "
                           "cache yet — serving with full-precision KV")
        src_np = np.asarray(src_ids)
        mask_np = np.asarray(src_mask)
        prompts = []
        for row, m in zip(src_np, mask_np):
            toks = [int(t) for t, keep in zip(row, m) if keep]
            prompts.append(toks + [gmask_id, sop_id])
        ids, mask = left_pad(prompts, pad_id)
        total = ids.shape[1] + max_length
        if kwargs.get("min_length"):
            # min_length arrives decoder-relative (min_decoder_length);
            # the engine compares against the absolute buffer position
            kwargs["min_length"] = ids.shape[1] + int(kwargs["min_length"])
        slack = (kwargs.get("num_draft_tokens", 8) + 1
                 if kwargs.get("speculative") else 0)
        prefill, decode = make_glm_generation_fns(self.module, total,
                                                  cache_slack=slack)
        seqs = generate(prefill, decode, self.params, jnp.asarray(ids),
                        jnp.asarray(mask), max_length=total,
                        num_beams=num_beams, do_sample=do_sample,
                        eos_token_id=eop_id, pad_token_id=pad_id, **kwargs)
        # strip the prompt from the TIME axis ([..., T] also covers the
        # [B, N, T] beam-list layout of num_return_sequences > 1)
        return jnp.asarray(seqs)[..., ids.shape[1]:]
