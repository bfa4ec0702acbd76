"""Train/eval statistics & observability.

Capability parity: reference easynlp/utils/statistics.py (loss accumulation,
console lines, TensorBoard scalars) — plus a machine-readable events.jsonl
that doubles as the benchmark trace."""

import json
import os
import time

from easynlp_tpu.utils.io_utils import io
from easynlp_tpu.utils.logger import logger


class Statistics:
    def __init__(self, args):
        self.args = args
        self.start = time.time()
        self.jsonl = None
        self.tb = None
        out = getattr(args, "checkpoint_dir", None)
        if out and getattr(args, "is_master_node", True):
            io.makedirs(out)
            self.jsonl = io.open(os.path.join(out, "events.jsonl"), "a")
            try:
                from torch.utils.tensorboard import SummaryWriter
                self.tb = SummaryWriter(log_dir=os.path.join(out, "tensorboard"))
            except Exception:  # tensorboard optional
                self.tb = None

    def _emit(self, record):
        if self.jsonl:
            self.jsonl.write(json.dumps(record) + "\n")
            self.jsonl.flush()

    def log_train(self, epoch, step, t_total, metrics, samples_per_sec=None):
        metrics = {k: float(v) for k, v in metrics.items()}
        msg = "epoch %d | step %d/%d | " % (epoch, step, t_total)
        msg += " | ".join("%s %.6g" % (k, v) for k, v in metrics.items())
        if samples_per_sec:
            msg += " | %.1f samples/s" % samples_per_sec
        msg += " | %.0fs" % (time.time() - self.start)
        logger.info(msg)
        rec = {"kind": "train", "epoch": epoch, "step": step, **metrics}
        if samples_per_sec:
            rec["samples_per_sec"] = samples_per_sec
        self._emit(rec)
        if self.tb:
            for k, v in metrics.items():
                self.tb.add_scalar("train/" + k, v, step)

    def log_eval(self, step, results):
        msg = "eval @ step %d | " % step + " | ".join(
            "%s %.6g" % (m, s) for m, s in results)
        logger.info(msg)
        self._emit({"kind": "eval", "step": step,
                    **{m: float(s) for m, s in results}})
        if self.tb:
            for m, s in results:
                self.tb.add_scalar("eval/" + m, float(s), step)

    def close(self):
        if self.jsonl:
            self.jsonl.close()
        if self.tb:
            self.tb.close()
