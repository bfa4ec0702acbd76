"""Infra utils: row-schema parsing and pretrained-model path resolution.

Capability parity: reference easynlp/utils/__init__.py (schema parsing :77-98,
get_pretrain_model_path remote-fetch :101-202 — here resolution is local-first
because this environment has no egress; a fetcher can be plugged via the io
layer)."""

import json
import os

from easynlp_tpu.utils.io_utils import io  # noqa: F401
from easynlp_tpu.utils.logger import logger


def parse_schema(input_schema):
    """'name:type:len,name:type:len' → list of (name, type, length).

    Types: str, int, float, plus list variants (int:N with N>1 means a
    length-N list, matching the reference's column contract)."""
    if not input_schema:
        return []
    out = []
    for col in input_schema.split(","):
        parts = col.split(":")
        name = parts[0]
        ctype = parts[1] if len(parts) > 1 else "str"
        clen = int(parts[2]) if len(parts) > 2 else 1
        out.append((name, ctype, clen))
    return out


def parse_row_by_schema(row, input_schema):
    """Split one TSV row into a {column: typed value} dict
    (reference utils/__init__.py:77-98)."""
    schema = input_schema if isinstance(input_schema, list) else parse_schema(input_schema)
    fields = row.rstrip("\n").split("\t")
    out = {}
    for (name, ctype, clen), value in zip(schema, fields):
        if ctype == "str":
            out[name] = value
        elif ctype == "int":
            out[name] = int(value) if clen == 1 else [int(x) for x in value.split(" ") if x]
        elif ctype == "float":
            out[name] = float(value) if clen == 1 else [float(x) for x in value.split(" ") if x]
        else:
            out[name] = value
    return out


MODELZOO_CACHE_ENV = "EASYNLP_MODELZOO_BASE_DIR"


def get_dir_name(path):
    return path if io.isdir(path) else os.path.dirname(path)


def get_pretrain_model_path(name_or_path, disable_auto_download=False):
    """Resolve a pretrained model name to a local directory.

    Resolution order: existing local path → $EASYNLP_MODELZOO_BASE_DIR/<name>
    → HF cache layout under ~/.easynlp_tpu/modelzoo/<name>. Remote download
    (reference utils/__init__.py:101-202 wget+untar) is a pluggable fetcher —
    not available in this zero-egress environment."""
    if not name_or_path:
        return name_or_path
    if os.path.exists(name_or_path):
        return name_or_path
    if "://" in str(name_or_path):
        # remote model dir (oss:// etc.): materialise through the io seam
        # into the local cache (reference utils/__init__.py:101-202 fetches
        # remote checkpoints before use)
        local = os.path.join(os.path.expanduser("~/.easynlp_tpu/modelzoo"),
                             str(name_or_path).split("://", 1)[1].strip("/"))
        if not os.path.isdir(local):
            # shared fetch helper: recursive copy into a temp dir, atomic
            # rename on success (partial fetches never register), tolerant
            # of a concurrent fetch of the same artifact
            from easynlp_tpu.utils.zoo_registry import _fetch_tree
            _fetch_tree(str(name_or_path), local)
            logger.info("fetched %s -> %s", name_or_path, local)
        return local
    candidates = []
    base = os.environ.get(MODELZOO_CACHE_ENV)
    if base:
        candidates.append(os.path.join(base, name_or_path))
    candidates.append(os.path.join(
        os.path.expanduser("~/.easynlp_tpu/modelzoo"), name_or_path))
    for cand in candidates:
        if os.path.isdir(cand):
            return cand
    if not disable_auto_download:
        # name->artifact resolution through the zoo registry (reference
        # utils/__init__.py:146-199 modelzoo_alibaba.json); the "remote" is
        # the io-seam root in EASYNLP_REMOTE_MODELZOO
        from easynlp_tpu.utils.zoo_registry import resolve_pretrained_name
        resolved = resolve_pretrained_name(name_or_path)
        if resolved:
            return resolved
    logger.warning("pretrained model %r not found locally; treating as config name",
                   name_or_path)
    return name_or_path


def load_json(path):
    with io.open(path) as f:
        return json.load(f)


def save_json(obj, path, indent=2):
    with io.open(path, "w") as f:
        json.dump(obj, f, ensure_ascii=False, indent=indent)
