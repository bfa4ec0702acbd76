"""Predictor stack.

Capability parity: reference easynlp/core/predictor.py — `Predictor` ABC with
run = postprocess(predict(preprocess(x))) (:65-79), `PyModelPredictor`
(:128-152), `PredictorManager` streaming a TSV file through the predictor in
batches and writing output_schema (+append_cols) columns (:181-229, 493-536).

TPU-native: predict is one jitted forward with static batch shape; the final
partial batch is padded and results sliced, so there is exactly one compile.
"""

import jax
import numpy as np

from easynlp_tpu.utils import parse_row_by_schema
from easynlp_tpu.utils.global_vars import get_args
from easynlp_tpu.utils.io_utils import io
from easynlp_tpu.utils.logger import logger


class Predictor:
    def preprocess(self, in_data):
        raise NotImplementedError

    def predict(self, in_data):
        raise NotImplementedError

    def postprocess(self, result):
        raise NotImplementedError

    def run(self, in_data):
        return self.postprocess(self.predict(self.preprocess(in_data)))


class PyModelPredictor(Predictor):
    """Wraps an Application: typed input keys → device → jitted forward →
    numpy outputs (reference predictor.py:128-152)."""

    def __init__(self, app, input_keys, output_keys, batch_size=32):
        self.app = app
        self.input_keys = input_keys      # [(name, dtype), ...]
        self.output_keys = output_keys    # output dict keys to fetch
        self.batch_size = batch_size
        module, keys = app.module, [k for k, _ in input_keys]

        def fwd(params, batch):
            # int8 serving: dequant INSIDE the jit so weights stay int8 in
            # HBM and XLA fuses convert*scale into each consumer matmul
            # (identity on unquantized trees)
            from easynlp_tpu.modelzoo.quantization import dequantize_for
            inputs = {k: batch[k] for k in keys if k in batch}
            return module.apply({"params": dequantize_for(module, params)},
                                **inputs, deterministic=True)
        self._fwd = jax.jit(fwd)

    def predict(self, in_data):
        bs = self.batch_size
        arrays = {k: np.asarray(v, dtype=d)
                  for (k, d), v in ((kd, in_data[kd[0]])
                                    for kd in self.input_keys)}
        # row count from the MODEL inputs, not whatever passthrough column
        # happens to iterate first — preprocessors may expand rows (e.g.
        # data_augmentation replicates each row augment_count times)
        n = len(next(iter(arrays.values())))
        outs = []
        for start in range(0, n, bs):
            chunk = {k: v[start:start + bs] for k, v in arrays.items()}
            real = len(next(iter(chunk.values())))
            if real < bs:  # pad to static shape
                chunk = {k: np.concatenate(
                    [v, np.repeat(v[-1:], bs - real, axis=0)])
                    for k, v in chunk.items()}
            res = jax.device_get(self._fwd(self.app.params, chunk))
            outs.append({k: np.asarray(res[k])[:real]
                         for k in self.output_keys if k in res})
        if not outs:  # empty input: empty output columns, no crash
            merged = {k: np.zeros((0,)) for k in self.output_keys}
        else:
            merged = {k: np.concatenate([o[k] for o in outs])
                      for k in outs[0]}
        # pass inputs through WITHOUT clobbering model outputs (an input
        # column named like an output key must not overwrite the prediction)
        for k, v in in_data.items():
            merged.setdefault(k, v)
        return merged


class PredictorManager:
    """Streams input_file through predictor in slices, writes TSV
    (reference SimplePredictorManager :181-229 + facade :493-536)."""

    def __init__(self, predictor, input_file, input_schema, output_file,
                 output_schema, append_cols=None, skip_first_line=False,
                 batch_size=None, args=None):
        self.predictor = predictor
        self.input_file = input_file
        self.input_schema = input_schema
        self.output_file = output_file
        self.output_schema = ([c for c in output_schema.split(",") if c]
                              if isinstance(output_schema, str) else output_schema)
        self.append_cols = ([c for c in (append_cols or "").split(",") if c]
                            if isinstance(append_cols, str) else (append_cols or []))
        self.skip_first_line = skip_first_line
        self.args = args or get_args()
        self.batch_size = batch_size or self.args.predict_slice_size

    def _chunks(self, f):
        """STREAM the file in batch_size slices — a multi-GB prediction TSV
        (base64-image rows) must never be materialised whole in host RAM."""
        first = self.skip_first_line
        chunk = []
        for line in f:
            if first:
                first = False
                continue
            if not line.strip():
                continue
            chunk.append(line)
            if len(chunk) == self.batch_size:
                yield chunk
                chunk = []
        if chunk:
            yield chunk

    def run(self):
        n_out = 0
        with io.open(self.input_file) as f, \
                io.open(self.output_file, "w") as out:
            for chunk in self._chunks(f):
                rows = [parse_row_by_schema(l, self.input_schema) for l in chunk]
                in_data = {k: [r[k] for r in rows] for k in rows[0]}
                result = self.predictor.run(in_data)
                for i in range(len(rows)):
                    cols = [str(_at(result[c], i)) for c in self.output_schema]
                    cols += [str(_at(in_data[c], i)) for c in self.append_cols]
                    out.write("\t".join(cols) + "\n")
                    n_out += 1
        logger.info("wrote %d predictions to %s", n_out, self.output_file)


def _at(value, i):
    v = value[i]
    if isinstance(v, (np.ndarray, list, tuple)):
        return " ".join(str(x) for x in np.asarray(v).reshape(-1))
    return v
