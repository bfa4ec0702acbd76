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
        self._jit_forward = {}

    def forward(self, app, batch):
        """Jit-compiled inference forward, cached PER APP module — one
        Evaluator may score several apps (teacher then student in a
        distillation run); a single cached closure would silently run the
        first app's module on the second app's params."""
        key = (id(app.module), tuple(app.model_input_keys))
        fn = self._jit_forward.get(key)
        if fn is None:
            module, keys = app.module, app.model_input_keys

            def fwd(params, batch):
                inputs = {k: batch[k] for k in keys if k in batch}
                return module.apply({"params": params}, **inputs,
                                    deterministic=True)
            fn = self._jit_forward[key] = jax.jit(fwd)
        return fn(app.params, batch)

    def evaluate(self, app):
        raise NotImplementedError
