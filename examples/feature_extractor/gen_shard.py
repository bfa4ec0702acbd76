"""Write a tiny webdataset tar shard + CLIP pretrain fixture for the
feature-extractor example (mirrors the appzoo tutorial fixtures)."""

import io
import json
import os
import sys
import tarfile

import numpy as np
from PIL import Image


def main(out_dir):
    os.makedirs(out_dir, exist_ok=True)
    tar_path = os.path.join(out_dir, "shard-000.tar")
    with tarfile.open(tar_path, "w") as tf:
        for i in range(12):
            arr = (np.random.RandomState(i).rand(16, 16, 3)
                   * 255).astype(np.uint8)
            buf = io.BytesIO()
            Image.fromarray(arr).save(buf, format="PNG")
            data = buf.getvalue()
            info = tarfile.TarInfo("%05d.png" % i)
            info.size = len(data)
            tf.addfile(info, io.BytesIO(data))
            cap = json.dumps({"caption": "picture %d" % i}).encode()
            info = tarfile.TarInfo("%05d.json" % i)
            info.size = len(cap)
            tf.addfile(info, io.BytesIO(cap))
    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.abspath(__file__)), "..", "appzoo_tutorials"))
    from gen_data import _clip_pretrain
    _clip_pretrain(os.path.join(out_dir, "pretrain"))
    print(out_dir)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "./data")
