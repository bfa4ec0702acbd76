import jax
import jax.numpy as jnp
import numpy as np
import pytest

from easynlp_tpu.utils import parse_row_by_schema, parse_schema
from easynlp_tpu.utils.arguments import parse_args, parse_mesh_spec
from easynlp_tpu.utils.global_vars import parse_user_defined_parameters
from easynlp_tpu.utils import losses


def test_parse_schema():
    schema = parse_schema("sent1:str:1,label:str:1,vec:float:4")
    assert schema == [("sent1", "str", 1), ("label", "str", 1), ("vec", "float", 4)]


def test_parse_row_by_schema():
    row = "hello world\t1\t0.5 1.5 2.5 3.5\n"
    out = parse_row_by_schema(row, "text:str:1,label:int:1,vec:float:4")
    assert out == {"text": "hello world", "label": 1, "vec": [0.5, 1.5, 2.5, 3.5]}


def test_parse_udp():
    p = parse_user_defined_parameters(
        "pretrain_model_name_or_path=bert-small multi_label=True "
        'app_parameters={"two_tower": "true", "margin": 0.3}')
    assert p["pretrain_model_name_or_path"] == "bert-small"
    assert p["multi_label"] is True
    assert p["two_tower"] is True
    assert p["margin"] == 0.3


def test_parse_mesh_spec():
    assert parse_mesh_spec(None, 8) == {"data": 8}
    assert parse_mesh_spec("dp=2,tp=4", 8) == {"data": 2, "tensor": 4}
    assert parse_mesh_spec("dp=-1,tp=2", 8) == {"data": 4, "tensor": 2}
    with pytest.raises(ValueError):
        parse_mesh_spec("dp=3", 8)


def test_parse_args_defaults():
    args = parse_args(args_list=["--mode=train", "--app_name=text_classify"])
    assert args.mode == "train"
    assert args.eval_batch_size == args.micro_batch_size


def test_cross_entropy_matches_manual():
    logits = jnp.array([[2.0, 0.5, -1.0], [0.1, 0.2, 0.3]])
    labels = jnp.array([0, 2])
    got = losses.cross_entropy(logits, labels)
    p = jax.nn.log_softmax(logits, axis=-1)
    want = -(p[0, 0] + p[1, 2]) / 2
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_cross_entropy_ignore_index():
    logits = jnp.zeros((4, 3))
    labels = jnp.array([0, -100, 1, -100])
    got = losses.cross_entropy(logits, labels)
    np.testing.assert_allclose(got, np.log(3.0), rtol=1e-4)


def test_kd_loss_limits():
    logits = jnp.array([[2.0, -1.0], [0.0, 1.0]])
    labels = jnp.array([0, 1])
    # alpha=1 → plain CE
    np.testing.assert_allclose(
        losses.vanilla_kd_loss(logits, logits * 3, labels, alpha=1.0),
        losses.cross_entropy(logits, labels), rtol=1e-6)
    # identical teacher/student at alpha=0 → zero KD loss
    np.testing.assert_allclose(
        losses.vanilla_kd_loss(logits, logits, labels, alpha=0.0), 0.0, atol=1e-6)


def test_clip_contrastive_loss_perfect():
    big = jnp.eye(4) * 100.0
    assert losses.clip_contrastive_loss(big) < 1e-3


def test_mesh_and_shardings():
    from easynlp_tpu.parallel import build_mesh, logical_to_sharding
    assert jax.device_count() == 8
    mesh = build_mesh({"data": 2, "tensor": 4})
    assert dict(mesh.shape) == {"data": 2, "tensor": 4}
    s = logical_to_sharding(("batch", "length", "embed"), mesh)
    assert s.spec[0] == "data"
    s2 = logical_to_sharding(("embed", "mlp"), mesh)
    assert s2.spec == jax.sharding.PartitionSpec(None, "tensor")


def test_mesh_drops_trivial_axes():
    from easynlp_tpu.parallel import build_mesh, logical_to_sharding
    mesh = build_mesh({"data": 8, "tensor": 1})
    s = logical_to_sharding(("embed", "mlp"), mesh)
    # tensor axis has size 1 → mlp must resolve to replicated
    assert s.spec == jax.sharding.PartitionSpec(None, None) or s.spec == jax.sharding.PartitionSpec()
