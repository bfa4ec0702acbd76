"""Wukong CLIP variant (capability parity: reference easynlp/appzoo/
wukong_clip/ — Huawei Wukong dual tower; same dual-tower contrastive
architecture, Wukong checkpoint dialect handled at conversion time)."""

from easynlp_tpu.appzoo.clip.model import CLIPApp


class WukongCLIP(CLIPApp):
    """Architecturally identical dual tower; Wukong checkpoints use a
    token-embedding text tower + ViT — conversion maps onto the same layout
    (modelzoo/models/clip/conversion.py)."""
