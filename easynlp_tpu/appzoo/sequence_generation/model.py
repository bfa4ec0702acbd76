"""Sequence generation application.

Capability parity: reference easynlp/appzoo/sequence_generation/model.py —
seq2seq & LM generation over BART/T5/mT5/Pegasus/Randeng/GPT-2 backbones with
copy-constrained beam search (:181-229 — the per-sample bad-words restriction
compiles to a static vocab mask here).
"""

import jax
import jax.numpy as jnp
import numpy as np

from easynlp_tpu.appzoo.application import Application
from easynlp_tpu.utils import losses

BACKBONES = {
    "t5": ("easynlp_tpu.modelzoo.models.t5", "T5Config",
           "T5ForConditionalGeneration"),
    "mt5": ("easynlp_tpu.modelzoo.models.t5", "MT5Config",
            "T5ForConditionalGeneration"),
    "bart": ("easynlp_tpu.modelzoo.models.bart", "BartConfig",
             "BartForConditionalGeneration"),
    "pegasus": ("easynlp_tpu.modelzoo.models.bart", "PegasusConfig",
                "BartForConditionalGeneration"),
    "randeng": ("easynlp_tpu.modelzoo.models.bart", "RandengConfig",
                "BartForConditionalGeneration"),
    "gpt2": ("easynlp_tpu.modelzoo.models.gpt2", "GPT2Config",
             "GPT2LMHeadModel"),
}


def _load_backbone(model_type):
    import importlib
    mod, cfg_name, cls_name = BACKBONES[model_type]
    m = importlib.import_module(mod)
    return getattr(m, cfg_name), getattr(m, cls_name)


class SequenceGeneration(Application):
    model_input_keys = ("input_ids", "attention_mask", "decoder_input_ids",
                        "decoder_attention_mask")

    def sample_inputs(self):
        if self.config.is_encoder_decoder:
            return {"input_ids": jnp.ones((1, 8), jnp.int32),
                    "decoder_input_ids": jnp.ones((1, 4), jnp.int32)}
        return {"input_ids": jnp.ones((1, 8), jnp.int32)}

    @staticmethod
    def loss_fn(outputs, batch):
        """Teacher-forced CE over decoder labels (-100 on pads); MoE models
        add the router load-balancing term (Switch §2.2)."""
        loss = losses.cross_entropy(outputs["logits"], batch["labels"],
                                    ignore_index=-100)
        out = {"loss": loss}
        if "moe_aux_loss" in outputs:
            # already scaled by router_aux_loss_coef in the model
            out["moe_aux_loss"] = outputs["moe_aux_loss"]
            out["loss"] = loss + outputs["moe_aux_loss"]
        return out

    @classmethod
    def load_config(cls, model_dir, **kwargs):
        import json
        import os

        from easynlp_tpu.utils import get_pretrain_model_path
        from easynlp_tpu.utils.io_utils import io
        path = get_pretrain_model_path(model_dir)
        with io.open(os.path.join(path, "config.json")) as f:
            d = json.load(f)
        cfg_cls, _ = _load_backbone(d.get("model_type", "t5"))
        return cfg_cls.from_pretrained(path)

    @classmethod
    def build_module(cls, config, args=None, dtype=jnp.float32, **kwargs):
        _, model_cls = _load_backbone(config.model_type)
        remat = getattr(args, "remat", "none") if args else "none"
        return model_cls(config=config, dtype=dtype, remat=remat)

    @classmethod
    def init_params(cls, module, config, seed=0):
        from flax import linen as nn
        rng = jax.random.PRNGKey(seed)
        kwargs = {"input_ids": jnp.ones((1, 8), jnp.int32)}
        if config.is_encoder_decoder:
            kwargs["decoder_input_ids"] = jnp.ones((1, 4), jnp.int32)
        variables = module.init({"params": rng, "dropout": rng},
                                deterministic=True, **kwargs)
        return nn.unbox(variables["params"])

    @classmethod
    def convert_pytorch_state_dict(cls, state_dict, config):
        mt = config.model_type
        if mt in ("t5", "mt5"):
            from easynlp_tpu.modelzoo.models.t5.conversion import (
                convert_t5_state_dict)
            return convert_t5_state_dict(state_dict, config)
        if mt in ("bart", "pegasus", "randeng"):
            from easynlp_tpu.modelzoo.models.bart.conversion import (
                convert_bart_state_dict)
            return convert_bart_state_dict(state_dict, config)
        if mt == "gpt2":
            from easynlp_tpu.modelzoo.models.gpt2.conversion import (
                convert_gpt2_state_dict)
            return convert_gpt2_state_dict(state_dict, config)
        raise NotImplementedError(mt)

    # -- generation -----------------------------------------------------------
    def generate(self, src_ids, src_mask, max_length=64, num_beams=1,
                 do_sample=False, copy_constrained=False, jit_compile=True,
                 **kwargs):
        """copy_constrained: restrict the output vocabulary to tokens present
        in the source (+ specials) — the reference's copy-restricted beam
        search as a static vocab mask.

        jit_compile: trace the whole generation (prefill + while-loop decode)
        into ONE compiled dispatch, cached per (shapes, decode config) — the
        predictor pads batches to a fixed size so serving hits one cache
        entry. Eager generation pays per-op dispatch overhead (~2ms/op
        through the axon tunnel) on every prefill."""
        if not getattr(self.config, "is_encoder_decoder", False):
            # decoder-only: app-level max_length means NEW tokens (reference
            # max_decoder_length) and prompts may arrive RIGHT-padded from
            # the tokenizer — the decode engine's contract is left-padded
            # prompts and a total buffer length, so normalize here, before
            # the jit cache (same width => shape-stable cache keys)
            from easynlp_tpu.modelzoo.generation_utils import left_pad
            src_np = np.asarray(src_ids)
            mask_np = np.asarray(src_mask)
            prompts = [[int(t) for t, keep in zip(row, m) if keep]
                       for row, m in zip(src_np, mask_np)]
            pad_id = self.config.pad_token_id or 0
            ids_np, lmask = left_pad(prompts, pad_id, length=src_np.shape[1])
            src_ids, src_mask = jnp.asarray(ids_np), jnp.asarray(lmask)
            max_length = src_np.shape[1] + max_length
        if copy_constrained:
            v = self.config.vocab_size
            allowed = np.zeros((src_ids.shape[0], v), bool)
            src_np = np.asarray(src_ids)
            for i, row in enumerate(src_np):
                allowed[i, row] = True
            for tid in (self.config.eos_token_id, self.config.pad_token_id,
                        getattr(self.config, "decoder_start_token_id", None)):
                if tid is not None and tid < v:
                    allowed[:, tid] = True
            if num_beams > 1:  # beam search flattens to [B*K, V]
                allowed = np.repeat(allowed, num_beams, axis=0)
            kwargs["bad_words_mask"] = jnp.asarray(~allowed)
        static = dict(kwargs, max_length=max_length, num_beams=num_beams,
                      do_sample=do_sample)
        traced = {k: static.pop(k) for k in ("bad_words_mask", "rng")
                  if k in static and static[k] is not None}
        if not jit_compile or any(not isinstance(v, (int, float, bool, str,
                                                     type(None)))
                                  for v in static.values()):
            return self._generate_impl(self.params, src_ids, src_mask,
                                       **static, **traced)
        key = (src_ids.shape, tuple(sorted(traced)),
               tuple(sorted(static.items())))
        fn = self._gen_cache.get(key)
        if fn is None:
            names = tuple(sorted(traced))

            def _run(params, ids, mask, extra):
                return self._generate_impl(
                    params, ids, mask, **static,
                    **dict(zip(names, extra)))

            fn = jax.jit(_run)
            self._gen_cache[key] = fn
        return fn(self.params, src_ids, src_mask,
                  tuple(traced[k] for k in sorted(traced)))

    @property
    def _gen_cache(self):
        if not hasattr(self, "_gen_cache_dict"):
            self._gen_cache_dict = {}
        return self._gen_cache_dict

    def _generate_impl(self, params, src_ids, src_mask, max_length=64,
                       num_beams=1, do_sample=False, **kwargs):
        if self.config.is_encoder_decoder:
            from easynlp_tpu.modelzoo.seq2seq_generation import (
                encoder_decoder_generate)
            kwargs.pop("kv_cache", None)  # int8 KV is decoder-only for now
            return encoder_decoder_generate(
                self.module, params, src_ids, src_mask,
                max_length=max_length, num_beams=num_beams,
                do_sample=do_sample, **kwargs)
        from easynlp_tpu.modelzoo.generation_utils import generate
        from easynlp_tpu.modelzoo.models.gpt2.generation import (
            make_gpt2_generation_fns)
        slack = (kwargs.get("num_draft_tokens", 8) + 1
                 if kwargs.get("speculative") else 0)
        prefill, decode = make_gpt2_generation_fns(
            self.module, max_length, cache_slack=slack,
            kv_cache=kwargs.pop("kv_cache", None))
        kwargs.setdefault("eos_token_id", self.config.eos_token_id)
        kwargs.setdefault("pad_token_id", self.config.pad_token_id or 0)
        return generate(prefill, decode, params, src_ids, src_mask,
                        max_length=max_length, num_beams=num_beams,
                        do_sample=do_sample, **kwargs)
