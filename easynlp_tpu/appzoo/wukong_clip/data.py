"""Wukong CLIP dataset (reference easynlp/appzoo/wukong_clip/data.py —
'text<TAB>base64image' rows through the Wukong BERT tokenizer + CLIP image
transform; the pipeline is the CLIP one, the checkpoint dialect differs)."""

from easynlp_tpu.appzoo.clip.data import CLIPDataset


class WukongCLIPDataset(CLIPDataset):
    pass
