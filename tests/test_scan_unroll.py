"""config.scan_unroll must not change numerics or param layout.

Full unroll removes the XLA while-loop (v5e-measured +13% on BERT-base);
these tests pin that the stacked 'layers' param axis and the outputs are
identical at any unroll, so checkpoints and parity results carry over.
"""

import jax
import jax.numpy as jnp
import numpy as np

from easynlp_tpu.testing import tiny_bert_config


def _forward(config, params=None):
    from easynlp_tpu.modelzoo.models.bert.modeling_bert import BertModel
    model = BertModel(config=config)
    ids = jnp.asarray(np.random.RandomState(0).randint(5, 900, (2, 16)))
    if params is None:
        params = model.init(jax.random.PRNGKey(0), ids)["params"]
    out = model.apply({"params": params}, ids)
    return params, out["last_hidden_state"]


def test_unroll_param_layout_and_outputs_identical():
    c1 = tiny_bert_config()
    c2 = tiny_bert_config()
    c2.scan_unroll = c2.num_hidden_layers  # full unroll
    p1, o1 = _forward(c1)
    # same params (layout must match), unrolled forward
    p2, o2 = _forward(c2, params=p1)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), atol=1e-6)
    # param trees structurally identical
    assert jax.tree_util.tree_structure(p1) == jax.tree_util.tree_structure(
        _forward(c2)[0])


def test_unroll_flag_flows_from_args(tmp_path):
    import json

    from easynlp_tpu.appzoo.sequence_classification.model import (
        SequenceClassification)
    from easynlp_tpu.testing import make_args

    cfg = tiny_bert_config()
    d = tmp_path / "m"
    d.mkdir()
    (d / "config.json").write_text(json.dumps(
        {**cfg.to_dict(), "model_type": "bert"}))
    args = make_args(scan_unroll=2)
    app = SequenceClassification.from_pretrained(str(d), args=args)
    assert getattr(app.config, "scan_unroll", 1) == 2
