"""Wukong CLIP variant (capability parity: reference easynlp/appzoo/
wukong_clip/ — Huawei Wukong dual tower; same dual-tower contrastive
architecture, Wukong checkpoint dialect handled at conversion time)."""

from easynlp_tpu.appzoo.clip.model import CLIPApp


class WukongCLIP(CLIPApp):
    """Dual tower with the Wukong checkpoint dialect: 'visual.*' OpenAI-CLIP
    ViT + 'bert.*' Chinese text tower (reference models/wukong/
    modeling_wukong.py:97-113 restore_model)."""

    @classmethod
    def convert_pytorch_state_dict(cls, state_dict, config):
        from easynlp_tpu.modelzoo.models.clip.conversion import convert_wukong
        return convert_wukong(state_dict, config)
