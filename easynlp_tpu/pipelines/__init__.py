"""pipeline() inference factory.

Capability parity: reference easynlp/pipelines/__init__.py — task registry
(SUPPORTED_TASKS :39-110), pipeline(task_or_model) factory (:112-150). The
remote app-model fetch (:200-249) resolves locally in this zero-egress
environment via get_pretrain_model_path.
"""

from easynlp_tpu.pipelines.implementation import Pipeline

SUPPORTED_TASKS = {
    "text_classify": {
        "impl": "easynlp_tpu.appzoo.sequence_classification.predictor:"
                "SequenceClassificationPredictor",
        "app": "text_classify",
        "default": "bert-base-sst",
    },
    "text_match": {
        "impl": "easynlp_tpu.appzoo.text_match.predictor:TextMatchPredictor",
        "app": "text_match",
        "default": "bert-small-qnli",
    },
    "sequence_labeling": {
        "impl": "easynlp_tpu.appzoo.sequence_labeling.predictor:"
                "SequenceLabelingPredictor",
        "app": "sequence_labeling",
        "default": "chinese-roberta-basener",
    },
    "vectorization": {
        "impl": "easynlp_tpu.appzoo.feature_vectorization.predictor:"
                "FeatureVectorizationPredictor",
        "app": "vectorization",
    },
    "data_augmentation": {
        "impl": "easynlp_tpu.appzoo.data_augmentation.predictor:"
                "DataAugmentationPredictor",
        "app": "data_augmentation",
    },
    "machine_reading_comprehension": {
        "impl": "easynlp_tpu.appzoo.machine_reading_comprehension.predictor:"
                "MRCPredictor",
        "app": "machine_reading_comprehension",
        "default": "macbert-base-rczh",
    },
    "text2image_generation": {
        "impl": "easynlp_tpu.appzoo.text2image_generation.predictor:"
                "TextImageGenerationPredictor",
        "app": "text2image_generation",
        "default": "artist-base-zh",
    },
    "image2text_generation": {
        "impl": "easynlp_tpu.appzoo.image2text_generation.predictor:"
                "ImageTextGenerationPredictor",
        "app": "image2text_generation",
        "default": "clip-gpt-i2t-base-zh",
    },
    # text generation is not a reference pipeline task (reference
    # pipelines/__init__.py:39-110 stops at the multimodal apps) but the
    # serving path (--mode=serve) rides pipeline(), so registering it makes
    # generation checkpoints servable with the full decode-parameter UDP
    # contract (incl. speculative_decoding)
    "sequence_generation": {
        "impl": "easynlp_tpu.appzoo.sequence_generation.predictor:"
                "SequenceGenerationPredictor",
        "app": "sequence_generation",
    },
    "open_domain_dialogue": {
        "impl": "easynlp_tpu.appzoo.sequence_generation.predictor:"
                "SequenceGenerationPredictor",
        "app": "open_domain_dialogue",
    },
}

# The reference registers its PAI-Diffusion model family as pipeline tasks
# (reference pipelines/__init__.py:63-105: chinese-ldm-* variants +
# stable-diffusion-general); all resolve to the StableDiffusionPipeline
# prompt→image path here.
for _ldm_task in ("latent_diffusion", "chinese-ldm-general",
                  "chinese-ldm-fashion", "chinese-ldm-art",
                  "chinese-ldm-poem", "chinese-ldm-anime", "chinese-ldm-pet",
                  "chinese-ldm-food", "stable-diffusion-general"):
    SUPPORTED_TASKS[_ldm_task] = {"diffusion": True, "app": "latent_diffusion"}


def get_supported_tasks():
    return sorted(SUPPORTED_TASKS)


def get_easynlp_model_list():
    """Registered app-model names (reference get_supported_app_model)."""
    from easynlp_tpu.utils.zoo_registry import get_supported_app_model
    return get_supported_app_model(sort=False)


def pipeline(task_or_model_path, model_path=None, **kwargs):
    """pipeline('text_classify') resolves the task's default model through
    the appzoo registry (reference pipelines/__init__.py:128-140);
    pipeline('<registered-model-name>') resolves that model and its app;
    pipeline(model_dir) infers the task from the saved train_config.json."""
    import json
    import os

    from easynlp_tpu.utils import get_pretrain_model_path
    from easynlp_tpu.utils.io_utils import io

    if task_or_model_path in SUPPORTED_TASKS:
        task = task_or_model_path
        if model_path is None:
            # default-model resolution via the appzoo registry (reference
            # pipelines/__init__.py:133-135 get_app_model_path(default))
            from easynlp_tpu.utils.zoo_registry import get_app_model_path
            default = SUPPORTED_TASKS[task].get("default")
            if default is None:
                # the PAI-Diffusion names double as task AND model names
                # (reference pipelines/__init__.py:63-105) — try the
                # app-model registry under the task name before giving up
                try:
                    model_path = get_app_model_path(task)
                except RuntimeError:
                    raise ValueError(
                        "pipeline(%r) needs model_path= (no default model "
                        "registered for this task)" % task) from None
            else:
                model_path = get_app_model_path(default)
    else:
        from easynlp_tpu.utils.zoo_registry import (
            get_app_model_path, get_remote_app_model_mapping)
        mapping = {}
        try:
            mapping = get_remote_app_model_mapping()
        except RuntimeError:
            pass
        if task_or_model_path in mapping:
            # a registered app-model name (reference :136-141)
            task = mapping[task_or_model_path]["app_name"]
            model_path = get_app_model_path(task_or_model_path, mapping)
            if task not in SUPPORTED_TASKS:
                raise KeyError("task %r not in SUPPORTED_TASKS" % task)
            return Pipeline(task, model_path, **kwargs)
        model_path = task_or_model_path
        cfg = os.path.join(get_pretrain_model_path(model_path),
                           "train_config.json")
        if not io.exists(cfg):
            raise ValueError(
                "cannot infer task: %s has no train_config.json" % model_path)
        with io.open(cfg) as f:
            task = json.load(f).get("app_name")
        if task not in SUPPORTED_TASKS:
            raise KeyError("task %r not in SUPPORTED_TASKS" % task)
    return Pipeline(task, get_pretrain_model_path(model_path), **kwargs)
