"""Generate the API reference pages (docs/api/*.md) by introspection.

The reference ships Sphinx autodoc stubs (reference docs/source/api/*.rst,
toctree in docs/source/index.rst). Sphinx isn't available in this
environment, so this script is the build step: it imports each documented
module, collects public classes/functions with their signatures and
docstring summaries, and writes one markdown page per section — same
section split as the reference (applications, modelzoo, fewshot,
distillation, core, data, losses, utils) plus TPU-specific sections
(ops, parallel, pipelines).

Run:  python docs/gen_api.py
"""

import importlib
import inspect
import os
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))

SECTIONS = {
    "applications": {
        "title": "easynlp_tpu.appzoo — applications",
        "intro": "Each app is a (dataset, model, evaluator, predictor) "
                 "quadruple dispatched by `--app_name` "
                 "(reference easynlp/appzoo/api.py registries).",
        "modules": [
            "easynlp_tpu.appzoo.application",
            "easynlp_tpu.appzoo.api",
            "easynlp_tpu.appzoo.sequence_classification.model",
            "easynlp_tpu.appzoo.text_match.model",
            "easynlp_tpu.appzoo.sequence_labeling.model",
            "easynlp_tpu.appzoo.language_modeling.model",
            "easynlp_tpu.appzoo.language_modeling.data",
            "easynlp_tpu.appzoo.language_modeling.dkplm_data",
            "easynlp_tpu.appzoo.language_modeling.kangaroo_data",
            "easynlp_tpu.appzoo.feature_vectorization.model",
            "easynlp_tpu.appzoo.data_augmentation.predictor",
            "easynlp_tpu.appzoo.geep_classification.model",
            "easynlp_tpu.appzoo.sequence_generation.model",
            "easynlp_tpu.appzoo.machine_reading_comprehension.model",
            "easynlp_tpu.appzoo.open_domain_dialogue.model",
            "easynlp_tpu.appzoo.information_extraction.model",
            "easynlp_tpu.appzoo.clip.model",
            "easynlp_tpu.appzoo.wukong_clip.model",
            "easynlp_tpu.appzoo.text2video_retrieval.model",
            "easynlp_tpu.appzoo.text2image_generation.model",
            "easynlp_tpu.appzoo.image2text_generation.model",
            "easynlp_tpu.appzoo.video2text_generation.model",
            "easynlp_tpu.appzoo.latent_diffusion.model",
            "easynlp_tpu.appzoo.latent_diffusion.controlnet_app",
        ],
    },
    "modelzoo": {
        "title": "easynlp_tpu.modelzoo — model families",
        "intro": "Vendored-HF-fork equivalent: configs, flax modules, "
                 "tokenizers, generation, auto classes. All encoders are "
                 "nn.scan-stacked with logical sharding axes; see "
                 "`config.scan_unroll` and `remat` for speed/memory knobs.",
        "modules": [
            "easynlp_tpu.modelzoo.configuration_utils",
            "easynlp_tpu.modelzoo.modeling_utils",
            "easynlp_tpu.modelzoo.tokenization_utils",
            "easynlp_tpu.modelzoo.tokenization_sentencepiece",
            "easynlp_tpu.modelzoo.generation_utils",
            "easynlp_tpu.modelzoo.quantization",
            "easynlp_tpu.modelzoo.models.auto.auto_factory",
            "easynlp_tpu.modelzoo.models.bert.modeling_bert",
            "easynlp_tpu.modelzoo.models.gpt2.modeling_gpt2",
            "easynlp_tpu.modelzoo.models.bart.modeling_bart",
            "easynlp_tpu.modelzoo.models.t5.modeling_t5",
            "easynlp_tpu.modelzoo.models.pegasus.modeling_pegasus",
            "easynlp_tpu.modelzoo.models.randeng.modeling_randeng",
            "easynlp_tpu.modelzoo.models.transformer.modeling_transformer",
            "easynlp_tpu.modelzoo.models.bloom.modeling_bloom",
            "easynlp_tpu.modelzoo.models.glm.modeling_glm",
            "easynlp_tpu.modelzoo.models.clip.modeling_clip",
            "easynlp_tpu.modelzoo.models.dkplm.modeling_dkplm",
            "easynlp_tpu.modelzoo.models.kbert.modeling_kbert",
            "easynlp_tpu.modelzoo.models.kangaroo.modeling_kangaroo",
            "easynlp_tpu.modelzoo.models.ckbert",
            "easynlp_tpu.modelzoo.models.megatron_bert",
            "easynlp_tpu.modelzoo.models.cnn",
            "easynlp_tpu.modelzoo.models.artist.modeling_artist",
            "easynlp_tpu.modelzoo.models.latent_diffusion.unet",
            "easynlp_tpu.modelzoo.models.latent_diffusion.autoencoder",
            "easynlp_tpu.modelzoo.models.latent_diffusion.ddim",
            "easynlp_tpu.modelzoo.models.latent_diffusion.controlnet",
        ],
    },
    "fewshot": {
        "title": "easynlp_tpu.fewshot_learning — PET / CPT",
        "intro": "Pattern-exploiting few-shot classification "
                 "(reference easynlp/fewshot_learning).",
        "modules": [
            "easynlp_tpu.fewshot_learning.fewshot_application",
            "easynlp_tpu.fewshot_learning.fewshot_dataset",
            "easynlp_tpu.fewshot_learning.fewshot_predictor",
        ],
    },
    "distillation": {
        "title": "easynlp_tpu.distillation — vanilla KD / MetaKD",
        "intro": "Teacher-logit distillation apps/datasets; trainers live "
                 "in easynlp_tpu.core.distiller.",
        "modules": [
            "easynlp_tpu.distillation.distill_application",
            "easynlp_tpu.distillation.distill_dataset",
            "easynlp_tpu.distillation.distill_metakd_application",
            "easynlp_tpu.distillation.distill_metakd_dataset",
            "easynlp_tpu.core.distiller",
        ],
    },
    "core": {
        "title": "easynlp_tpu.core — trainer / evaluator / predictor",
        "intro": "One pjit Trainer covers the reference's DDP trainer AND "
                 "its Megatron loop (DP/FSDP/TP/SP are mesh axes).",
        "modules": [
            "easynlp_tpu.core.trainer",
            "easynlp_tpu.core.evaluator",
            "easynlp_tpu.core.predictor",
            "easynlp_tpu.core.optimizers",
        ],
    },
    "data": {
        "title": "easynlp_tpu.data — datasets & loaders",
        "intro": "Schema'd TSV/ODPS/OSS sources, streaming readers, "
                 "device prefetch.",
        "modules": [
            "easynlp_tpu.data.dataset",
            "easynlp_tpu.data.lazy_loader",
            "easynlp_tpu.data.odps_reader",
            "easynlp_tpu.data.native_reader",
            "easynlp_tpu.data.fast_tokenizer",
            "easynlp_tpu.data.fast_sp",
            "easynlp_tpu.data.image_utils",
            "easynlp_tpu.data.prefetch",
        ],
    },
    "losses": {
        "title": "easynlp_tpu.utils.losses",
        "intro": "All reference losses (CE, soft CE, KD, multi-label BCE, "
                 "hinge, circle, cosine-embedding, MSE).",
        "modules": ["easynlp_tpu.utils.losses"],
    },
    "utils": {
        "title": "easynlp_tpu.utils — infra",
        "intro": "Flags, globals, IO abstraction, logging, exporters, "
                 "statistics, initializer.",
        "modules": [
            "easynlp_tpu.utils.arguments",
            "easynlp_tpu.utils.global_vars",
            "easynlp_tpu.utils.initializer",
            "easynlp_tpu.utils.io_utils",
            "easynlp_tpu.utils.oss_io",
            "easynlp_tpu.utils.exporter",
            "easynlp_tpu.utils.adapter",
            "easynlp_tpu.utils.statistics",
            "easynlp_tpu.utils.logger",
        ],
    },
    "ops": {
        "title": "easynlp_tpu.ops — TPU kernels",
        "intro": "Pallas kernels + XLA formulations behind the shared "
                 "`attention()` entry, fused vocab-parallel CE, ring "
                 "attention (sequence parallelism).",
        "modules": [
            "easynlp_tpu.ops.attention",
            "easynlp_tpu.ops.fused_ce",
            "easynlp_tpu.ops.ring_attention",
        ],
    },
    "parallel": {
        "title": "easynlp_tpu.parallel — mesh & sharding",
        "intro": "Mesh construction (--mesh 'dp=2,fsdp=2,tp=2'), logical-"
                 "axis sharding rules (TP without model changes).",
        "modules": [
            "easynlp_tpu.parallel.mesh",
            "easynlp_tpu.parallel.sharding",
        ],
    },
    "pipelines": {
        "title": "easynlp_tpu.pipelines — inference factory",
        "intro": "pipeline(task_or_model) with the reference's 14-task "
                 "registry.",
        "modules": [
            "easynlp_tpu.pipelines",
            "easynlp_tpu.pipelines.implementation",
        ],
    },
}


def _sig(obj):
    try:
        return str(inspect.signature(obj))
    except (ValueError, TypeError):
        return "(...)"


def _doc_first(obj, limit=3):
    doc = inspect.getdoc(obj) or ""
    lines = [ln.rstrip() for ln in doc.splitlines()]
    # first paragraph, up to `limit` lines
    out = []
    for ln in lines:
        if not ln and out:
            break
        if ln:
            out.append(ln)
        if len(out) >= limit:
            break
    return " ".join(out)


def document_module(modname, out):
    try:
        mod = importlib.import_module(modname)
    except Exception as e:  # pragma: no cover - docs build resilience
        out.append("### `%s`\n\n*import failed: %s*\n" % (modname, e))
        return
    out.append("### `%s`\n" % modname)
    head = _doc_first(mod, limit=4)
    if head:
        out.append(head + "\n")
    members = []
    for name, obj in sorted(vars(mod).items()):
        if name.startswith("_"):
            continue
        if getattr(obj, "__module__", None) != modname:
            continue
        if inspect.isclass(obj):
            members.append(("class", name, obj))
        elif inspect.isfunction(obj):
            members.append(("def", name, obj))
    for kind, name, obj in members:
        summary = _doc_first(obj)
        if kind == "class":
            out.append("- **class `%s`** — %s" % (name, summary or "—"))
            for mname, meth in sorted(vars(obj).items()):
                if mname.startswith("_") or not callable(meth):
                    continue
                fn = meth.__func__ if isinstance(
                    meth, (classmethod, staticmethod)) else meth
                if not inspect.isfunction(fn):
                    continue
                msum = _doc_first(fn, limit=1)
                if msum:
                    out.append("    - `%s%s` — %s" % (mname, _sig(fn), msum))
        else:
            out.append("- **`%s%s`** — %s" % (name, _sig(obj), summary or "—"))
    out.append("")


def main():
    api_dir = os.path.join(HERE, "api")
    os.makedirs(api_dir, exist_ok=True)
    for section, spec in SECTIONS.items():
        out = ["# %s\n" % spec["title"], spec["intro"] + "\n",
               "*Generated by `python docs/gen_api.py` — do not edit.*\n"]
        for modname in spec["modules"]:
            document_module(modname, out)
        path = os.path.join(api_dir, section + ".md")
        with open(path, "w", encoding="utf-8") as f:
            f.write("\n".join(out))
        print("wrote", path)


if __name__ == "__main__":
    main()
