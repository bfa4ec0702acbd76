"""CLIP image-feature extraction over webdataset tar shards or base64 TSVs.

TPU-native equivalent of the reference examples/feature_extractor/
main_featext.py (webdataset → CLIP image tower → normalised feature rows):
the dataset layer already understands webdataset shards
(easynlp_tpu/appzoo/clip/data.py), so this main batches the image tower
over the shard and writes `index \t text \t feature-csv` rows.

    python main_featext.py --mode=predict \
        --tables=shard-000.tar --outputs=features.tsv \
        --checkpoint_dir=<clip-model-dir> \
        --micro_batch_size=32 --sequence_length=32 \
        --user_defined_parameters='image_size=224'
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))


def main():
    import jax
    import numpy as np

    import easynlp_tpu
    from easynlp_tpu.appzoo.clip.data import CLIPDataset
    from easynlp_tpu.appzoo.clip.model import CLIPApp
    from easynlp_tpu.appzoo.api import _tokenizer_for
    from easynlp_tpu.data.dataset import DataLoader
    from easynlp_tpu.utils.global_vars import get_args

    easynlp_tpu.initialize_easynlp()
    args = get_args()
    udp = getattr(args, "user_defined_parameters_dict", {}) or {}
    ckpt = args.checkpoint_dir

    tokenizer = _tokenizer_for(ckpt)
    dataset = CLIPDataset(
        args.tables.split(",")[0], tokenizer=tokenizer,
        max_seq_length=args.sequence_length,
        input_schema=args.input_schema,
        first_sequence=args.first_sequence or "text",
        second_sequence=args.second_sequence or "image",
        image_size=int(udp.get("image_size", 224)),
        process_index=args.process_index, num_processes=args.num_processes)
    app = CLIPApp.from_pretrained(ckpt, args=args)

    @jax.jit
    def image_tower(params, pixel_values):
        out = app.module.apply({"params": params},
                               pixel_values=pixel_values,
                               deterministic=True)
        return out["image_embeds"]  # already L2-normalised

    loader = DataLoader(dataset, batch_size=args.micro_batch_size,
                        shuffle=False)
    n = 0
    with open(args.outputs, "w") as fout:
        for batch in loader:
            valid = batch.pop("_valid").astype(bool)
            feats = np.asarray(jax.device_get(
                image_tower(app.params, batch["pixel_values"])),
                np.float32)[valid]
            for f in feats:
                text = dataset.texts[n] if hasattr(dataset, "texts") else ""
                fout.write("%d\t%s\t%s\n"
                           % (n, text, ",".join("%.6f" % x for x in f)))
                n += 1
    print("wrote %d feature rows to %s" % (n, args.outputs))


if __name__ == "__main__":
    main()
