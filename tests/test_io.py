"""Save/load round-trip tests for safetensors and Orbax checkpoints."""

import numpy as np
import jax
import jax.numpy as jnp

from sdnq_tpu import QuantConfig, QTensor, quantize_model, dequantize
from sdnq_tpu.io import (
    save_quantized, load_quantized, save_checkpoint, restore_checkpoint,
)


def _params():
    rng = np.random.default_rng(0)
    w = lambda s: jnp.asarray(rng.normal(size=s).astype(np.float32))
    return {
        "blocks": [
            {"attn": {"to_q": {"weight": w((256, 256)),
                               "bias": w((256,))}}},
            {"mlp": {"fc1": {"weight": w((512, 256))}}},
        ],
        "norm": {"weight": w((256,))},
    }


def test_safetensors_roundtrip(tmp_path):
    params = _params()
    cfg = QuantConfig(weights_dtype="int4", use_hadamard=True, use_svd=True,
                      svd_rank=8)
    qp, cfg = quantize_model(params, cfg)
    save_quantized(qp, str(tmp_path), cfg)

    loaded, cfg2 = load_quantized(str(tmp_path))
    assert cfg2 is not None and cfg2.weights_dtype == "int4"
    qt = loaded["blocks"][0]["attn"]["to_q"]["weight"]
    assert isinstance(qt, QTensor)
    assert qt.meta == qp["blocks"][0]["attn"]["to_q"]["weight"].meta
    np.testing.assert_array_equal(
        np.asarray(qt.qdata),
        np.asarray(qp["blocks"][0]["attn"]["to_q"]["weight"].qdata))
    # dequantized weights identical
    np.testing.assert_allclose(
        np.asarray(dequantize(qt, jnp.float32)),
        np.asarray(dequantize(qp["blocks"][0]["attn"]["to_q"]["weight"],
                              jnp.float32)), rtol=1e-6)
    # plain leaves preserved (incl. bias and 1D norm weight)
    np.testing.assert_array_equal(
        np.asarray(loaded["norm"]["weight"]),
        np.asarray(params["norm"]["weight"]))
    np.testing.assert_array_equal(
        np.asarray(loaded["blocks"][0]["attn"]["to_q"]["bias"]),
        np.asarray(params["blocks"][0]["attn"]["to_q"]["bias"]))


def test_safetensors_bf16_leaves(tmp_path):
    params = {"fc": {"weight": jnp.ones((64, 64), jnp.bfloat16) * 1.5}}
    save_quantized(params, str(tmp_path))
    loaded, _ = load_quantized(str(tmp_path))
    assert loaded["fc"]["weight"].dtype == jnp.bfloat16
    assert float(loaded["fc"]["weight"][0, 0]) == 1.5


def test_orbax_checkpoint_roundtrip(tmp_path):
    from sdnq_tpu.train import convert_model_to_training
    from sdnq_tpu.optim import adamw

    params = _params()
    qp, _ = quantize_model(params, QuantConfig(weights_dtype="int8"))
    tp = convert_model_to_training(qp)
    opt = adamw(lr=1e-3)
    state = opt.init(tp)
    full = {"params": tp, "opt": state}

    save_checkpoint(str(tmp_path / "ckpt"), full)
    restored = restore_checkpoint(str(tmp_path / "ckpt"), full)
    w0 = tp["blocks"][1]["mlp"]["fc1"]["weight"]
    r0 = restored["params"]["blocks"][1]["mlp"]["fc1"]["weight"]
    np.testing.assert_array_equal(np.asarray(r0.qt.qdata),
                                  np.asarray(w0.qt.qdata))
    assert int(restored["opt"]["step"]) == 0


def test_streaming_hf_load_and_quantize(tmp_path):
    """Simulate an HF checkpoint: flat dotted keys in safetensors -> stream,
    assemble, quantize on the fly."""
    from safetensors.numpy import save_file
    from sdnq_tpu.io import load_and_quantize_state_dict

    rng = np.random.default_rng(0)
    sd = {
        "transformer_blocks.0.attn.to_q.weight":
            rng.normal(size=(256, 256)).astype(np.float32),
        "transformer_blocks.0.attn.to_q.bias":
            rng.normal(size=(256,)).astype(np.float32),
        "transformer_blocks.1.ff.fc1.weight":
            rng.normal(size=(512, 256)).astype(np.float32),
        "proj_out.weight": rng.normal(size=(64, 256)).astype(np.float32),
        "norm.weight": rng.normal(size=(256,)).astype(np.float32),
    }
    save_file(sd, str(tmp_path / "model.safetensors"))
    params, cfg = load_and_quantize_state_dict(
        str(tmp_path / "model.safetensors"),
        QuantConfig(weights_dtype="int8"),
        arch="FluxTransformer2DModel")
    blocks = params["transformer_blocks"]
    assert isinstance(blocks, list) and len(blocks) == 2
    assert isinstance(blocks[0]["attn"]["to_q"]["weight"], QTensor)
    assert isinstance(blocks[1]["ff"]["fc1"]["weight"], QTensor)
    # proj_out is a skip key for Flux
    assert not isinstance(params["proj_out"]["weight"], QTensor)
    assert blocks[0]["attn"]["to_q"]["bias"].dtype == jnp.bfloat16


def test_check_tree_coverage_exact_and_mismatch():
    """Unit semantics of the loader coverage gate (VERDICT r3 #8): exact
    trees pass, missing/extra leaves raise with both paths named, and
    ``optional`` prefixes are exempt on either side."""
    import pytest
    from sdnq_tpu.io.hf import CheckpointCoverageError, check_tree_coverage

    exp = {"a": {"w": 1, "b": 2}, "blocks": [{"w": 3}, {"w": 4}]}
    check_tree_coverage({"a": {"w": 0, "b": 0},
                         "blocks": [{"w": 0}, {"w": 0}]}, exp)

    with pytest.raises(CheckpointCoverageError, match="missing: a.b"):
        check_tree_coverage({"a": {"w": 0},
                             "blocks": [{"w": 0}, {"w": 0}]}, exp)
    with pytest.raises(CheckpointCoverageError, match="unexpected: zz"):
        check_tree_coverage({"a": {"w": 0, "b": 0}, "zz": 9,
                             "blocks": [{"w": 0}, {"w": 0}]}, exp)
    # optional prefixes may be absent (e.g. VAE quant_conv) or extra
    check_tree_coverage({"a": {"w": 0, "b": 0}, "opt": {"x": 1},
                         "blocks": [{"w": 0}, {"w": 0}]}, exp,
                        optional=("opt",))
    check_tree_coverage({"a": {"w": 0}, "blocks": [{"w": 0}, {"w": 0}]},
                        exp, optional=("a.b",))


def test_device_put_packed_roundtrip():
    """Single-buffer tree transfer (utils/transfer.py) is bit-exact for
    mixed-dtype trees including packed QTensors."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from sdnq_tpu import quantize_tensor
    from sdnq_tpu.utils.transfer import device_put_packed
    rng = np.random.default_rng(0)
    tree = {
        "f32": jnp.asarray(rng.normal(size=(17,)).astype(np.float32)),
        "bf16": jnp.asarray(rng.normal(size=(3, 5)).astype(np.float32))
            .astype(jnp.bfloat16),
        "i8": jnp.asarray(rng.integers(-100, 100, (9,)), jnp.int8),
        "q": quantize_tensor(
            jnp.asarray(rng.normal(size=(64, 128)).astype(np.float32)),
            "int4", group_size=32),
        "scalar": jnp.float32(2.5),
    }
    out = device_put_packed(tree, jax.devices()[0])
    assert jax.tree_util.tree_all(jax.tree_util.tree_map(
        lambda x, y: bool((np.asarray(x) == np.asarray(y)).all()),
        tree, out))
