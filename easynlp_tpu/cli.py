"""CLI entry.

Capability parity: reference easynlp/cli.py — but single-process: the
reference re-execs `torch.distributed.launch` with one process per GPU
(cli.py:86-100); on TPU one jax process owns every local chip, and multi-host
runs launch this same entry once per host with EASYNLP_PROCESS_INDEX /
EASYNLP_NUM_PROCESSES / --coordinator_address set (initializer.py handles
jax.distributed.initialize). Usage:

    python -m easynlp_tpu.cli --mode=train --app_name=text_classify \
        --tables=train.tsv,dev.tsv --input_schema=... --first_sequence=... \
        --label_name=... --checkpoint_dir=./out
"""

import os
import sys

from easynlp_tpu.appzoo.api import default_main_fn
from easynlp_tpu.utils.initializer import initialize_easynlp


def main(argv=None):
    # EASYNLP_PLATFORM=cpu forces the backend before init via jax.config —
    # needed because on some plugin setups (axon) the JAX_PLATFORMS env var
    # alone does not take effect. Used by the examples smoke tests.
    plat = os.environ.get("EASYNLP_PLATFORM")
    if plat:
        import jax
        jax.config.update("jax_platforms", plat)
    args = initialize_easynlp(args_list=argv)
    default_main_fn(args)
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
