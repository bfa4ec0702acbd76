"""App dispatch + default main.

Capability parity: reference easynlp/appzoo/api.py — the five registries keyed
by app_name with variant sub-keys from user_defined_parameters
(Dataset_Mapping :107, ModelMapping :141, Eval_Model_Mapping :180,
Evaluator_Mapping :213, Predictor_Mapping :245) and default_main_fn (:471),
which is the real train/evaluate/predict entry behind the CLI.
"""

import os

import jax.numpy as jnp

from easynlp_tpu.utils.global_vars import get_args
from easynlp_tpu.utils.logger import logger

# --------------------------------------------------------------------------
# registries: app_name -> (variant-key -> class). "default" is the base app.
# Variant keys mirror the reference's user_defined_parameters switches.
# --------------------------------------------------------------------------


def _lazy(path, name):
    def load():
        import importlib
        return getattr(importlib.import_module(path), name)
    return load


DATASET_REGISTRY = {
    "text_classify": {
        "default": _lazy("easynlp_tpu.appzoo.sequence_classification.data",
                         "ClassificationDataset"),
        "enable_distillation": _lazy(
            "easynlp_tpu.distillation.distill_dataset",
            "DistillatoryClassificationDataset"),
        "enable_fewshot": _lazy(
            "easynlp_tpu.fewshot_learning.fewshot_dataset", "FewshotDataset"),
        "enable_metakd": _lazy(
            "easynlp_tpu.distillation.distill_metakd_dataset",
            "MetaKDClassificationDataset"),
    },
    "text_match": {
        "default": _lazy("easynlp_tpu.appzoo.text_match.data",
                         "TextMatchDataset"),
        "two_tower": _lazy("easynlp_tpu.appzoo.text_match.data",
                           "TwoTowerDataset"),
        "siamese": _lazy("easynlp_tpu.appzoo.text_match.data",
                         "TwoTowerDataset"),
    },
    "sequence_labeling": {
        "default": _lazy("easynlp_tpu.appzoo.sequence_labeling.data",
                         "SequenceLabelingDataset"),
    },
    "language_modeling": {
        "default": _lazy("easynlp_tpu.appzoo.language_modeling.data",
                         "LanguageModelingDataset"),
        "enable_kangaroo": _lazy(
            "easynlp_tpu.appzoo.language_modeling.kangaroo_data",
            "KangarooPretrainDataset"),
        "enable_dkplm": _lazy(
            "easynlp_tpu.appzoo.language_modeling.dkplm_data",
            "DKPLMPretrainDataset"),
        "enable_glm": _lazy(
            "easynlp_tpu.appzoo.language_modeling.glm_pretrain",
            "GLMPretrainDataset"),
    },
    "vectorization": {
        "default": _lazy("easynlp_tpu.appzoo.sequence_classification.data",
                         "ClassificationDataset"),
    },
    "data_augmentation": {
        "default": _lazy("easynlp_tpu.appzoo.language_modeling.data",
                         "LanguageModelingDataset"),
    },
    "machine_reading_comprehension": {
        "default": _lazy(
            "easynlp_tpu.appzoo.machine_reading_comprehension.data",
            "MRCDataset"),
    },
    "information_extraction": {
        "default": _lazy("easynlp_tpu.appzoo.information_extraction.data",
                         "InformationExtractionDataset"),
    },
    "geep_classify": {
        "default": _lazy("easynlp_tpu.appzoo.sequence_classification.data",
                         "ClassificationDataset"),
    },
    "clip": {
        "default": _lazy("easynlp_tpu.appzoo.clip.data", "CLIPDataset"),
    },
    "sequence_generation": {
        "default": _lazy("easynlp_tpu.appzoo.sequence_generation.data",
                         "SequenceGenerationDataset"),
        "enable_glm": _lazy("easynlp_tpu.appzoo.sequence_generation.glm",
                            "GLMSequenceGenerationDataset"),
    },
    "latent_diffusion": {
        "default": _lazy("easynlp_tpu.appzoo.latent_diffusion.data",
                         "LDMDataset"),
    },
    "open_domain_dialogue": {
        "default": _lazy("easynlp_tpu.appzoo.sequence_generation.data",
                         "SequenceGenerationDataset"),
    },
    "wukong_clip": {
        "default": _lazy("easynlp_tpu.appzoo.wukong_clip.data",
                         "WukongCLIPDataset"),
    },
    "text2video_retrieval": {
        "default": _lazy("easynlp_tpu.appzoo.text2video_retrieval.data",
                         "Text2VideoRetrievalDataset"),
    },
    "text2image_generation": {
        "default": _lazy("easynlp_tpu.appzoo.text2image_generation.data",
                         "TextImageDataset"),
    },
    "image2text_generation": {
        "default": _lazy("easynlp_tpu.appzoo.image2text_generation.data",
                         "ImageTextDataset"),
        "enable_vqgan": _lazy(
            "easynlp_tpu.appzoo.image2text_generation.vqgan_model",
            "VQGANImageTextDataset"),
    },
    "video2text_generation": {
        "default": _lazy("easynlp_tpu.appzoo.video2text_generation.data",
                         "FrameTextDataset"),
    },
}

MODEL_REGISTRY = {
    "text_classify": {
        "default": _lazy("easynlp_tpu.appzoo.sequence_classification.model",
                         "SequenceClassification"),
        "multi_label": _lazy("easynlp_tpu.appzoo.sequence_classification.model",
                             "SequenceMultiLabelClassification"),
        "enable_distillation": _lazy(
            "easynlp_tpu.distillation.distill_application",
            "DistillatorySequenceClassification"),
        "enable_fewshot": _lazy(
            "easynlp_tpu.fewshot_learning.fewshot_application",
            "FewshotClassification"),
        "enable_metakd": _lazy(
            "easynlp_tpu.distillation.distill_metakd_application",
            "MetaTeacherClassification"),
    },
    "text_match": {
        "default": _lazy("easynlp_tpu.appzoo.text_match.model", "TextMatch"),
        "two_tower": _lazy("easynlp_tpu.appzoo.text_match.model",
                           "TextMatchTwoTower"),
        "siamese": _lazy("easynlp_tpu.appzoo.text_match.model",
                         "TextMatchTwoTower"),
    },
    "sequence_labeling": {
        "default": _lazy("easynlp_tpu.appzoo.sequence_labeling.model",
                         "SequenceLabeling"),
    },
    "language_modeling": {
        "default": _lazy("easynlp_tpu.appzoo.language_modeling.model",
                         "LanguageModeling"),
        "contrast_learning_flag": _lazy(
            "easynlp_tpu.appzoo.language_modeling.model",
            "CKBertLanguageModeling"),
        "enable_kangaroo": _lazy(
            "easynlp_tpu.appzoo.language_modeling.model",
            "KangarooLanguageModeling"),
        "enable_dkplm": _lazy(
            "easynlp_tpu.appzoo.language_modeling.model",
            "DKPLMLanguageModeling"),
        "enable_glm": _lazy("easynlp_tpu.appzoo.sequence_generation.glm",
                            "GLMSequenceGeneration"),
    },
    "vectorization": {
        "default": _lazy("easynlp_tpu.appzoo.feature_vectorization.model",
                         "FeatureVectorization"),
    },
    "data_augmentation": {
        "default": _lazy("easynlp_tpu.appzoo.language_modeling.model",
                         "LanguageModeling"),
    },
    "machine_reading_comprehension": {
        "default": _lazy(
            "easynlp_tpu.appzoo.machine_reading_comprehension.model",
            "MachineReadingComprehension"),
    },
    "information_extraction": {
        "default": _lazy("easynlp_tpu.appzoo.information_extraction.model",
                         "InformationExtractionModel"),
    },
    "geep_classify": {
        "default": _lazy("easynlp_tpu.appzoo.geep_classification.model",
                         "GEEPClassification"),
    },
    "clip": {
        "default": _lazy("easynlp_tpu.appzoo.clip.model", "CLIPApp"),
    },
    "wukong_clip": {
        "default": _lazy("easynlp_tpu.appzoo.wukong_clip.model", "WukongCLIP"),
    },
    "text2video_retrieval": {
        "default": _lazy("easynlp_tpu.appzoo.text2video_retrieval.model",
                         "Text2VideoRetrieval"),
    },
    "text2image_generation": {
        "default": _lazy("easynlp_tpu.appzoo.text2image_generation.model",
                         "TextImageGeneration"),
    },
    "image2text_generation": {
        "default": _lazy("easynlp_tpu.appzoo.image2text_generation.model",
                         "CLIPGPTImageTextGeneration"),
        "enable_vit": _lazy("easynlp_tpu.appzoo.image2text_generation.model",
                            "CLIPGPTImageTextGeneration"),
        "enable_vqgan": _lazy(
            "easynlp_tpu.appzoo.image2text_generation.vqgan_model",
            "VQGANGPTImageTextGeneration"),
    },
    "video2text_generation": {
        "default": _lazy("easynlp_tpu.appzoo.video2text_generation.model",
                         "CLIPGPTFrameTextGeneration"),
    },
    "latent_diffusion": {
        "default": _lazy("easynlp_tpu.appzoo.latent_diffusion.model",
                         "LatentDiffusion"),
    },
    "sequence_generation": {
        "default": _lazy("easynlp_tpu.appzoo.sequence_generation.model",
                         "SequenceGeneration"),
        "enable_glm": _lazy("easynlp_tpu.appzoo.sequence_generation.glm",
                            "GLMSequenceGeneration"),
    },
    "open_domain_dialogue": {
        "default": _lazy("easynlp_tpu.appzoo.open_domain_dialogue.model",
                         "OpenDomainDialogue"),
    },
}

EVALUATOR_REGISTRY = {
    "text_classify": {
        "default": _lazy("easynlp_tpu.appzoo.sequence_classification.evaluator",
                         "SequenceClassificationEvaluator"),
    },
    "text_match": {
        "default": _lazy("easynlp_tpu.appzoo.text_match.evaluator",
                         "TextMatchEvaluator"),
        "two_tower": _lazy("easynlp_tpu.appzoo.text_match.evaluator",
                           "TextMatchTwoTowerEvaluator"),
        "siamese": _lazy("easynlp_tpu.appzoo.text_match.evaluator",
                         "TextMatchTwoTowerEvaluator"),
    },
    "sequence_labeling": {
        "default": _lazy("easynlp_tpu.appzoo.sequence_labeling.evaluator",
                         "SequenceLabelingEvaluator"),
    },
    "language_modeling": {
        "default": _lazy("easynlp_tpu.appzoo.language_modeling.evaluator",
                         "LanguageModelingEvaluator"),
        "enable_glm": _lazy(
            "easynlp_tpu.appzoo.language_modeling.glm_pretrain",
            "GLMPretrainEvaluator"),
    },
    "machine_reading_comprehension": {
        "default": _lazy(
            "easynlp_tpu.appzoo.machine_reading_comprehension.evaluator",
            "MRCEvaluator"),
    },
    "information_extraction": {
        "default": _lazy("easynlp_tpu.appzoo.information_extraction.evaluator",
                         "InformationExtractionEvaluator"),
    },
    "geep_classify": {
        "default": _lazy("easynlp_tpu.appzoo.sequence_classification.evaluator",
                         "SequenceClassificationEvaluator"),
    },
    "clip": {
        "default": _lazy("easynlp_tpu.appzoo.clip.evaluator", "CLIPEvaluator"),
    },
    "sequence_generation": {
        "default": _lazy("easynlp_tpu.appzoo.sequence_generation.evaluator",
                         "SequenceGenerationEvaluator"),
    },
    "open_domain_dialogue": {
        "default": _lazy("easynlp_tpu.appzoo.sequence_generation.evaluator",
                         "SequenceGenerationEvaluator"),
    },
    "wukong_clip": {
        "default": _lazy("easynlp_tpu.appzoo.wukong_clip.evaluator",
                         "WukongCLIPEvaluator"),
    },
    "text2video_retrieval": {
        "default": _lazy("easynlp_tpu.appzoo.text2video_retrieval.evaluator",
                         "Text2VideoRetrievalEvaluator"),
    },
    "text2image_generation": {
        "default": _lazy("easynlp_tpu.appzoo.text2image_generation.evaluator",
                         "TextImageGenerationEvaluator"),
    },
    "image2text_generation": {
        "default": _lazy("easynlp_tpu.appzoo.image2text_generation.evaluator",
                         "ImageTextGenerationEvaluator"),
    },
    "video2text_generation": {
        "default": _lazy("easynlp_tpu.appzoo.video2text_generation.evaluator",
                         "FrameTextGenerationEvaluator"),
    },
    "latent_diffusion": {
        "default": _lazy("easynlp_tpu.appzoo.latent_diffusion.evaluator",
                         "LDMEvaluator"),
    },
}

PREDICTOR_REGISTRY = {
    "text_classify": {
        "default": _lazy("easynlp_tpu.appzoo.sequence_classification.predictor",
                         "SequenceClassificationPredictor"),
        "enable_fewshot": _lazy(
            "easynlp_tpu.fewshot_learning.fewshot_predictor",
            "FewshotPredictor"),
    },
    "text_match": {
        "default": _lazy("easynlp_tpu.appzoo.text_match.predictor",
                         "TextMatchPredictor"),
        "two_tower": _lazy("easynlp_tpu.appzoo.text_match.predictor",
                           "TextMatchTwoTowerPredictor"),
        "siamese": _lazy("easynlp_tpu.appzoo.text_match.predictor",
                         "TextMatchTwoTowerPredictor"),
    },
    "sequence_labeling": {
        "default": _lazy("easynlp_tpu.appzoo.sequence_labeling.predictor",
                         "SequenceLabelingPredictor"),
    },
    "vectorization": {
        "default": _lazy("easynlp_tpu.appzoo.feature_vectorization.predictor",
                         "FeatureVectorizationPredictor"),
    },
    "data_augmentation": {
        "default": _lazy("easynlp_tpu.appzoo.data_augmentation.predictor",
                         "DataAugmentationPredictor"),
    },
    "machine_reading_comprehension": {
        "default": _lazy(
            "easynlp_tpu.appzoo.machine_reading_comprehension.predictor",
            "MRCPredictor"),
    },
    "information_extraction": {
        "default": _lazy("easynlp_tpu.appzoo.information_extraction.predictor",
                         "InformationExtractionPredictor"),
    },
    "geep_classify": {
        "default": _lazy("easynlp_tpu.appzoo.sequence_classification.predictor",
                         "SequenceClassificationPredictor"),
    },
    "clip": {
        "default": _lazy("easynlp_tpu.appzoo.clip.predictor", "CLIPPredictor"),
    },
    "sequence_generation": {
        "default": _lazy("easynlp_tpu.appzoo.sequence_generation.predictor",
                         "SequenceGenerationPredictor"),
    },
    "open_domain_dialogue": {
        "default": _lazy("easynlp_tpu.appzoo.sequence_generation.predictor",
                         "SequenceGenerationPredictor"),
    },
    "latent_diffusion": {
        "default": _lazy("easynlp_tpu.appzoo.latent_diffusion.predictor",
                         "LDMPredictor"),
    },
    "wukong_clip": {
        "default": _lazy("easynlp_tpu.appzoo.wukong_clip.predictor",
                         "WukongCLIPPredictor"),
    },
    "text2video_retrieval": {
        "default": _lazy("easynlp_tpu.appzoo.text2video_retrieval.predictor",
                         "Text2VideoRetrievalPredictor"),
    },
    "text2image_generation": {
        "default": _lazy("easynlp_tpu.appzoo.text2image_generation.predictor",
                         "TextImageGenerationPredictor"),
    },
    "image2text_generation": {
        "default": _lazy("easynlp_tpu.appzoo.image2text_generation.predictor",
                         "ImageTextGenerationPredictor"),
    },
    "video2text_generation": {
        "default": _lazy("easynlp_tpu.appzoo.video2text_generation.predictor",
                         "FrameTextGenerationPredictor"),
    },
}


def _variant_key(registry_entry, udp):
    """Pick the registry variant from user_defined_parameters switches
    (reference api.py keys: multi_label / two_tower / enable_distillation /
    enable_fewshot ...)."""
    for key in ("enable_metakd", "enable_distillation", "enable_fewshot",
                "enable_kangaroo", "enable_dkplm", "enable_glm",
                "multi_label", "two_tower", "siamese", "enable_vit",
                "enable_vqgan", "contrast_learning_flag"):
        if udp.get(key) and key in registry_entry:
            return key
    return "default"


def _resolve(registry, app_name, udp):
    if app_name not in registry:
        raise NotImplementedError(
            "app %r is not yet available in this registry "
            "(available: %s)" % (app_name, sorted(registry)))
    entry = registry[app_name]
    return entry[_variant_key(entry, udp)]()


def get_application_dataset(app_name, udp=None, **kwargs):
    cls = _resolve(DATASET_REGISTRY, app_name, udp or {})
    return cls(**kwargs)


def get_application_model(app_name, udp=None, **kwargs):
    return _resolve(MODEL_REGISTRY, app_name, udp or {})


def get_application_evaluator(app_name, valid_dataset, udp=None, **kwargs):
    cls = _resolve(EVALUATOR_REGISTRY, app_name, udp or {})
    return cls(valid_dataset, **kwargs)


def get_application_predictor(app_name, udp=None, **kwargs):
    cls = _resolve(PREDICTOR_REGISTRY, app_name, udp or {})
    return cls(**kwargs)


def _tokenizer_for(path):
    """Model-type-routed tokenizer (reference tokenization_auto.py): GPT-2 BPE
    for gpt2/bart, SentencePiece for t5/mt5/pegasus/glm, WordPiece otherwise.
    Falls back to BertTokenizer for bare vocab.txt directories without a
    config.json."""
    from easynlp_tpu.modelzoo.models.auto.auto_factory import AutoTokenizer
    try:
        return AutoTokenizer.from_pretrained(path)
    except (FileNotFoundError, KeyError, ValueError):
        from easynlp_tpu.modelzoo.models.bert import BertTokenizer
        return BertTokenizer.from_pretrained(path)


def _serve_continuous_main(args, udp, dtype):
    """--mode=serve + serve_continuous=true: continuous-batching generation
    serving for decoder-only checkpoints. Loads the module/params via
    AutoModel, wraps them in a ContinuousBatcher (requests join/leave the
    shared decode loop mid-flight), and exposes POST /generate with
    per-request sampling params through GenerationServer — the TPU-native
    online-generation counterpart of the reference's commented-out elastic
    predictor spec (reference easynlp/core/predictor.py:232-490).

    udp keys: serve_host/serve_port/serve_blocking (shared with the
    pipeline server), serve_slots (decode batch width, default 8),
    serve_chunk_size (decode steps per dispatch, default 16),
    serve_prompt_buckets (comma-separated prefill widths, default
    sequence_length//4), serve_max_new_tokens (default 32),
    serve_quantize=int8 (weight-only int8, dequantized per-dispatch),
    serve_shared_prefix (system-prompt text, tokenized once; requests then
    send only suffixes — the prefix KV is prefilled once and reused) or
    serve_shared_prefix_ids (comma-separated token ids, same effect).
    The KV window is --sequence_length: size it to prefix + prompt +
    generation like max_model_len in any slot-based server."""
    from easynlp_tpu.modelzoo.models.auto.auto_factory import AutoModel
    from easynlp_tpu.serving import ContinuousBatcher, GenerationServer

    module, params = AutoModel.from_pretrained(args.checkpoint_dir,
                                               dtype=dtype)
    if params is None:
        raise ValueError("no loadable checkpoint in %r"
                         % args.checkpoint_dir)
    if str(udp.get("serve_quantize", "")) == "int8":
        from easynlp_tpu.modelzoo.quantization import quantize_params
        params = quantize_params(params)
    # generation serving is weight-streaming-bound: cast the (f32-stored)
    # kernels to the compute dtype by default under bf16 so the decode loop
    # streams half the bytes — the matmuls read bf16 operands either way.
    # Opt out with serve_params_dtype=float32.
    pd = str(udp.get("serve_params_dtype",
                     "bfloat16" if args.dtype == "bfloat16" else "")).strip()
    if pd in ("bfloat16", "bf16"):
        from easynlp_tpu.modelzoo.quantization import cast_params
        params = cast_params(params, jnp.bfloat16)
    tokenizer = _tokenizer_for(args.checkpoint_dir)
    max_length = int(args.sequence_length)
    raw = udp.get("serve_prompt_buckets")
    if raw:
        buckets = tuple(sorted(int(b) for b in str(raw).split(",")))
    else:
        buckets = (max(8, max_length // 4),)
    if buckets[-1] >= max_length:
        raise ValueError(
            "largest prompt bucket %d must stay below the KV window "
            "(--sequence_length=%d) to leave room for generation"
            % (buckets[-1], max_length))
    eos = udp.get("serve_eos_token_id",
                  getattr(tokenizer, "eos_token_id", None))
    pad = udp.get("serve_pad_token_id",
                  getattr(tokenizer, "pad_token_id", None))
    prefix = None
    if udp.get("serve_shared_prefix_ids"):
        prefix = [int(x) for x in
                  str(udp["serve_shared_prefix_ids"]).split(",")]
    elif udp.get("serve_shared_prefix"):
        text = str(udp["serve_shared_prefix"])
        prefix = (list(tokenizer.encode(text))
                  if hasattr(tokenizer, "encode") else
                  list(tokenizer.convert_tokens_to_ids(
                      tokenizer.tokenize(text))))
    if prefix and len(prefix) + buckets[-1] >= max_length:
        raise ValueError(
            "shared prefix (%d tokens) + largest prompt bucket %d must "
            "stay below the KV window (--sequence_length=%d)"
            % (len(prefix), buckets[-1], max_length))
    batcher = ContinuousBatcher(
        module, params,
        max_slots=int(udp.get("serve_slots", 8)),
        max_length=max_length,
        prompt_buckets=buckets,
        eos_token_id=None if eos is None else int(eos),
        pad_token_id=0 if pad is None else int(pad),
        chunk_size=int(udp.get("serve_chunk_size", 16)),
        shared_prefix=prefix)
    server = GenerationServer(
        batcher,
        host=udp.get("serve_host", "127.0.0.1"),
        port=int(udp.get("serve_port", 8080)),
        tokenizer=tokenizer,
        default_max_new_tokens=int(udp.get("serve_max_new_tokens", 32)),
        info={"model": str(args.checkpoint_dir), "mode": "continuous"})
    if str(udp.get("serve_blocking", "True")) != "False":
        server.serve_forever()
    else:
        server.start()
    return server


# --------------------------------------------------------------------------
# default main (reference api.py:471-614)
# --------------------------------------------------------------------------

def default_main_fn(args=None):
    args = args or get_args()
    udp = args.user_defined_parameters_dict
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32

    if args.mode == "predict":
        return _predict_main(args, udp)

    if args.mode == "export":
        return _export_main(args, udp, dtype)

    if args.mode == "serve":
        # HTTP online serving over the pipeline() view of the checkpoint
        # (easynlp_tpu/serving). udp keys: serve_host/serve_port/
        # serve_max_delay_ms/serve_blocking.
        if str(udp.get("serve_continuous", "")).lower() in ("1", "true"):
            return _serve_continuous_main(args, udp, dtype)
        from easynlp_tpu.serving import serve
        return serve(
            args.checkpoint_dir,
            host=udp.get("serve_host", "127.0.0.1"),
            port=int(udp.get("serve_port", 8080)),
            max_batch_size=args.micro_batch_size,
            max_delay_ms=float(udp.get("serve_max_delay_ms", 5.0)),
            blocking=str(udp.get("serve_blocking", "True")) != "False",
            first_sequence=args.first_sequence or "first_sequence",
            second_sequence=args.second_sequence,
            sequence_length=args.sequence_length,
            batch_size=args.micro_batch_size,
            dtype=dtype,
            quantize=udp.get("serve_quantize") or None,
            params_dtype=udp.get("serve_params_dtype") or None)

    tables = (args.tables or "").split(",")
    model_cls = get_application_model(args.app_name, udp)
    tokenizer = _tokenizer_for(args.pretrained_model_name_or_path
                               if args.mode == "train"
                               else args.checkpoint_dir)

    dataset_kwargs = dict(
        tokenizer=tokenizer,
        max_seq_length=args.sequence_length,
        input_schema=args.input_schema,
        first_sequence=args.first_sequence,
        second_sequence=args.second_sequence,
        label_name=args.label_name,
        label_enumerate_values=args.label_enumerate_values,
        multi_label=bool(udp.get("multi_label")),
        image_size=int(udp.get("image_size", 224)),
        image_cache=udp.get("image_cache"),
        image_cache_items=udp.get("image_cache_items"),
        user_defined_parameters=udp,
        process_index=args.process_index,
        num_processes=args.num_processes,
    )

    if args.mode == "train":
        train_file = tables[0]
        valid_file = tables[1] if len(tables) > 1 else None
        train_dataset = get_application_dataset(
            args.app_name, udp, data_file=train_file, is_training=True,
            **dataset_kwargs)
        if args.label_enumerate_values is None and \
                train_dataset.label_enumerate_values:
            dataset_kwargs["label_enumerate_values"] = \
                train_dataset.label_enumerate_values
        evaluator = None
        if valid_file:
            valid_dataset = get_application_dataset(
                args.app_name, udp, data_file=valid_file, **dataset_kwargs)
            evaluator = get_application_evaluator(
                args.app_name, valid_dataset, udp, args=args,
                multi_label=bool(udp.get("multi_label")))
        app = model_cls.from_pretrained(
            args.pretrained_model_name_or_path, args=args, dtype=dtype,
            num_labels=max(len(train_dataset.label_enumerate_values), 2),
            label_mapping=train_dataset.label_mapping
            if hasattr(train_dataset, "label_mapping") else None)
        if udp.get("enable_controlnet"):
            # train the conditioning clone, base frozen (reference
            # diffusion/chinese_sd_webui infers with such checkpoints; the
            # wrapper supplies the training recipe that produces them)
            from easynlp_tpu.appzoo.latent_diffusion.controlnet_app import (
                ControlNetApplication)
            app = ControlNetApplication(
                app, hint_type=udp.get("controlnet_hint", "edge"))
        elif udp.get("enable_lora"):
            # adapter-only finetune (reference diffusion/diffusers_api LoRA);
            # generic — any app family accepts it
            from easynlp_tpu.core.lora_app import LoRAApplication
            from easynlp_tpu.modelzoo.lora import parse_targets
            app = LoRAApplication(
                app, rank=int(udp.get("lora_rank", 4)),
                alpha=float(udp["lora_alpha"])
                if udp.get("lora_alpha") else None,
                targets=parse_targets(udp.get("lora_targets")))
        from easynlp_tpu.core.trainer import Trainer
        trainer_cls, trainer_kwargs = Trainer, {}
        if udp.get("enable_metakd"):
            from easynlp_tpu.core.distiller import MetaTeacherTrainer
            trainer_cls = MetaTeacherTrainer
            trainer_kwargs = {"user_defined_parameters": udp}
        trainer = trainer_cls(app, train_dataset, evaluator=evaluator,
                              args=args, tokenizer=tokenizer,
                              **trainer_kwargs)
        trainer.train()
        return trainer

    if args.mode == "evaluate":
        valid_dataset = get_application_dataset(
            args.app_name, udp, data_file=tables[0], **dataset_kwargs)
        app = model_cls.from_pretrained(
            args.checkpoint_dir, args=args, dtype=dtype,
            num_labels=max(len(valid_dataset.label_enumerate_values), 2))
        evaluator = get_application_evaluator(
            args.app_name, valid_dataset, udp, args=args,
            multi_label=bool(udp.get("multi_label")))
        results = evaluator.evaluate(app)
        for metric, score in results:
            logger.info("eval %s: %.6f", metric, score)
        return results

    raise ValueError("unknown mode %r" % args.mode)


def _export_main(args, udp, dtype):
    """--mode=export: write the trained backbone as a torch / TF checkpoint
    for cross-ecosystem deployment (reference utils/exporter.py:81-193
    exports pytorch→TF for EAS serving; here native→{pytorch,tf}).
    udp: export_format=pytorch|tf (default pytorch)."""
    from easynlp_tpu.utils.exporter import (export_bert_backbone_to_pytorch,
                                            export_tf_checkpoint)
    model_cls = get_application_model(args.app_name, udp)
    ckpt = args.checkpoint_dir
    app = model_cls.from_pretrained(ckpt, args=args, dtype=dtype)
    params = app.params
    if "backbone" not in params:
        raise ValueError(
            "--mode=export currently exports BERT-family backbones; app %r "
            "has no 'backbone' params subtree" % args.app_name)
    fmt = str(udp.get("export_format", "pytorch"))
    if fmt == "pytorch":
        out = args.outputs or os.path.join(ckpt, "pytorch_model_export.bin")
        return export_bert_backbone_to_pytorch(params["backbone"],
                                               app.config, out)
    if fmt == "tf":
        out = args.outputs or os.path.join(ckpt, "tf_export", "bert_model.ckpt")
        os.makedirs(os.path.dirname(out), exist_ok=True)
        return export_tf_checkpoint(params["backbone"], app.config, out)
    raise ValueError("unknown export_format %r (pytorch|tf)" % fmt)


def _predict_main(args, udp):
    import json

    from easynlp_tpu.core.predictor import PredictorManager
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    model_cls = get_application_model(args.app_name, udp)
    ckpt = args.predict_checkpoint_path or args.checkpoint_dir
    num_labels = 2
    label_path = os.path.join(ckpt, "label_mapping.json")
    from easynlp_tpu.utils.io_utils import io
    if io.exists(label_path):
        with io.open(label_path) as f:
            num_labels = max(len(json.load(f)), 2)
    app = model_cls.from_pretrained(ckpt, args=args, dtype=dtype,
                                    num_labels=num_labels)
    predictor = get_application_predictor(
        args.app_name, udp, model_dir=ckpt, app=app,
        first_sequence=args.first_sequence,
        second_sequence=args.second_sequence,
        sequence_length=args.sequence_length,
        batch_size=args.micro_batch_size,
        user_defined_parameters=udp,
        multi_label=bool(udp.get("multi_label")))
    manager = PredictorManager(
        predictor=predictor,
        input_file=(args.tables or "").split(",")[0],
        input_schema=args.input_schema,
        output_file=args.outputs,
        output_schema=args.output_schema,
        append_cols=args.append_cols,
        args=args)
    manager.run()
    return manager
