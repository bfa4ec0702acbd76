"""Evaluator base (capability parity: reference easynlp/core/evaluator.py:19-34
— holds the valid loader and best score; subclasses implement evaluate(model)
returning [(metric, score), ...] sorted primary-first)."""

import jax

from easynlp_tpu.data.dataset import DataLoader
from easynlp_tpu.utils.global_vars import get_args


class Evaluator:
    def __init__(self, valid_dataset, eval_batch_size=None, args=None,
                 **kwargs):
        self.args = args or get_args()
        bs = eval_batch_size or self.args.eval_batch_size
        self.valid_loader = DataLoader(valid_dataset, batch_size=bs,
                                       shuffle=False)
        self.best_valid_score = float("-inf")
        self._jit_forward = None

    def forward(self, app, batch):
        """Jit-compiled inference forward, cached across calls."""
        if self._jit_forward is None:
            module, keys = app.module, app.model_input_keys

            def fwd(params, batch):
                inputs = {k: batch[k] for k in keys if k in batch}
                return module.apply({"params": params}, **inputs,
                                    deterministic=True)
            self._jit_forward = jax.jit(fwd)
        return self._jit_forward(app.params, batch)

    def evaluate(self, app):
        raise NotImplementedError
