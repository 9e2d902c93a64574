"""Quantized training tests: custom_vjp gradients, conversion, optimizers."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from sdnq_tpu import QTensor, QuantConfig, quantize_model, quantize_tensor, \
    dequantize
from sdnq_tpu.train import (
    value_and_grad as vag, grad as tgrad,
    TrainQTensor, convert_model_to_training,
    convert_training_model_to_inference, make_train_params, train_qlinear,
)
from sdnq_tpu.optim import adamw, lion, adafactor, came, muon, \
    zeropower_via_newtonschulz5, BufferQ


def _w(shape, seed=0, scale=1.0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.normal(size=shape).astype(np.float32) * scale)


def test_train_qlinear_grads_match_dense():
    w = _w((128, 256))
    x = _w((64, 256), seed=1, scale=0.3)
    g_out = _w((64, 128), seed=2)
    qt = quantize_tensor(w, "int8", group_size=-1)
    tp = TrainQTensor(qt=qt, delta=jnp.zeros((128, 256), jnp.float32))

    def loss(x, tp):
        return jnp.sum(train_qlinear(x, tp) * g_out)

    gx, gtp = tgrad(loss, argnums=(0, 1))(x, tp)
    # reference grads through the dequantized weight
    wd = dequantize(qt, jnp.float32)
    gx_ref = g_out @ wd
    gw_ref = g_out.T @ x
    # dynamic-int8 backward GEMMs: ~1% relative error expected
    rel_x = float(jnp.abs(gx - gx_ref).max() / jnp.abs(gx_ref).max())
    rel_w = float(jnp.abs(gtp.delta - gw_ref).max() / jnp.abs(gw_ref).max())
    assert rel_x < 0.05, rel_x
    assert rel_w < 0.05, rel_w


def test_train_qlinear_save_quantized_activations():
    w = _w((128, 256))
    x = _w((64, 256), seed=1, scale=0.3)
    qt = quantize_tensor(w, "int8", group_size=-1)
    tp = TrainQTensor(qt=qt, delta=jnp.zeros((128, 256), jnp.float32))

    def loss(tp):
        return jnp.sum(
            train_qlinear(x, tp, save_quantized_activations=True) ** 2)

    g = tgrad(loss)(tp)
    assert bool(jnp.isfinite(g.delta).all())
    assert float(jnp.abs(g.delta).max()) > 0


@pytest.mark.parametrize("fmt,mm", [("int8", "int8"), ("uint8", "uint8"),
                                    ("float8_e4m3fn", "float8_e4m3fn"),
                                    ("int8", "float16")])
@pytest.mark.parametrize("save_q", [False, True])
def test_backward_is_dtype_faithful_per_family(fmt, mm, save_q):
    """Backward GEMMs run in the layer's own matmul family (reference backs
    fp8 with fp8: linear_fp8_dynamic.py; uint8 with the double-zero-point
    algebra: linear_uint8_dynamic.py) and stay within quantization noise of
    dense grads."""
    w = _w((128, 256))
    x = _w((64, 256), seed=1, scale=0.3)
    g_out = _w((64, 128), seed=2)
    qt = quantize_tensor(w, fmt, matmul_fmt=mm, group_size=-1,
                         use_quantized_matmul=True)
    tp = TrainQTensor(qt=qt, delta=jnp.zeros((128, 256), jnp.float32))

    def loss(x, tp):
        return jnp.sum(train_qlinear(
            x, tp, save_quantized_activations=save_q) * g_out)

    gx, gtp = tgrad(loss, argnums=(0, 1))(x, tp)
    wd = dequantize(qt, jnp.float32)
    gx_ref = g_out @ wd
    gw_ref = g_out.T @ x
    rel_x = float(jnp.abs(gx - gx_ref).max() / jnp.abs(gx_ref).max())
    rel_w = float(jnp.abs(gtp.delta - gw_ref).max() / jnp.abs(gw_ref).max())
    tol = 0.02 if mm == "float16" else 0.06
    assert rel_x < tol, (fmt, mm, save_q, rel_x)
    assert rel_w < tol, (fmt, mm, save_q, rel_w)


def test_dynamic_tensor_fmt_families():
    from sdnq_tpu.train import DynamicTensor
    from sdnq_tpu import qlinear
    w = _w((64, 128))
    x = _w((32, 128), seed=3, scale=0.3)
    ref = x @ w.T
    for fmt in ("int8", "uint8", "float8_e4m3fn", "float16"):
        dt = DynamicTensor(w=w, fmt=fmt)
        y = qlinear(x, dt)
        rel = float(jnp.abs(y.astype(jnp.float32) - ref).max()
                    / jnp.abs(ref).max())
        assert rel < 0.05, (fmt, rel)
        g = tgrad(lambda p: jnp.sum(qlinear(x, p) ** 2))(dt)
        assert bool(jnp.isfinite(g.w).all())


def test_convert_roundtrip():
    params = {"fc": {"weight": quantize_tensor(_w((128, 256)), "int8",
                                               use_svd=True, svd_rank=8)},
              "bias": {"weight": _w((64,))}}
    tparams = convert_model_to_training(params)
    fc = tparams["fc"]["weight"]
    assert isinstance(fc, TrainQTensor)
    assert fc.qt.svd_up is None  # svd baked into storage for training
    back = convert_training_model_to_inference(tparams)
    assert isinstance(back["fc"]["weight"], QTensor)


@pytest.mark.parametrize("make_opt", [adamw, lion, adafactor, came])
def test_optimizer_reduces_loss(make_opt):
    w = _w((64, 256), scale=0.5)
    target = _w((64, 256), seed=3, scale=0.5)
    qt = quantize_tensor(w, "int8", group_size=64)
    params = {"w": TrainQTensor(qt=qt,
                                delta=jnp.zeros((64, 256), jnp.float32))}
    opt = make_opt(lr=2e-2, quantize_state=True, stochastic_rounding=True)
    state = opt.init(params)

    def loss_fn(params):
        wd = dequantize(params["w"].qt, jnp.float32) + params["w"].delta
        return jnp.mean((wd - target) ** 2)

    losses = []
    rng = jax.random.key(0)
    for i in range(12):
        rng, k = jax.random.split(rng)
        loss, grads = vag(loss_fn)(params)
        params, state = opt.update(grads, state, params, rng=k)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.9, losses


def test_optimizer_state_is_quantized():
    qt = quantize_tensor(_w((256, 256)), "int8")
    params = {"w": TrainQTensor(qt=qt,
                                delta=jnp.zeros((256, 256), jnp.float32))}
    opt = adamw(lr=1e-3, quantize_state=True)
    state = opt.init(params)
    st = state["per_param"][0]
    assert isinstance(st["m"], BufferQ)
    assert isinstance(st["v"], BufferQ)
    assert st["m"].qdata.dtype == jnp.uint8  # microfloat codes
    assert st["v"].unsigned
    assert "kahan" in st


def test_newton_schulz_orthogonalizes():
    g = _w((64, 128), seed=4)
    o = zeropower_via_newtonschulz5(g, steps=10, dtype=jnp.float32)
    gram = np.asarray(o @ o.T)
    # approximately orthogonal rows
    off = gram - np.eye(64)
    assert np.abs(off).max() < 0.35


def test_gram_newton_schulz_matches_standard():
    """Gram-NS with the tuned schedule orthogonalizes as well as plain NS
    (reference muon.py:270-298)."""
    g = _w((64, 192), seed=4)
    o = zeropower_via_newtonschulz5(g, use_gram_ns=True, dtype=jnp.float32)
    gram = np.asarray(o @ o.T)
    off = gram - np.eye(64)
    assert np.abs(off).max() < 0.35, np.abs(off).max()
    # tall input exercises the transposed path
    g2 = _w((192, 64), seed=7)
    o2 = zeropower_via_newtonschulz5(g2, use_gram_ns=True, dtype=jnp.float32)
    gram2 = np.asarray(o2.T @ o2)
    assert np.abs(gram2 - np.eye(64)).max() < 0.35


def test_muon_adaptive_mode_reduces_loss():
    params = {"w": _w((64, 256), scale=0.5)}
    opt = muon(lr=5e-3, adaptive=True, quantize_state=False)
    state = opt.init(params)
    target = _w((64, 256), seed=6, scale=0.5)

    def loss_fn(p):
        return jnp.mean((p["w"] - target) ** 2)

    losses = []
    rng = jax.random.key(1)
    for _ in range(10):
        rng, k = jax.random.split(rng)
        loss, grads = vag(loss_fn)(params)
        params, state = opt.update(grads, state, params, rng=k)
        losses.append(float(loss))
    assert losses[-1] < losses[0], losses
    # adaptive mode carries a v-buffer on muon params
    st = state["per_param"][0]
    assert st["muon"] and "v" in st


def test_optimizer_offload_and_transfer_cast_roundtrip():
    from sdnq_tpu.optim import (cast_state_from_transfer,
                                cast_state_for_transfer, fetch_opt_state,
                                offload_opt_state)
    params = {"w": _w((256, 256)), "b": _w((256,), seed=2)}
    opt = adamw(lr=1e-3, quantize_state=False)
    state = opt.init(params)
    off = offload_opt_state(state)          # no-op on CPU backend, must not
    back = fetch_opt_state(off)             # corrupt structure either way
    g = jax.tree_util.tree_map(jnp.ones_like, params)
    p2, _ = opt.update(g, back, params, rng=jax.random.key(0))
    assert jnp.isfinite(p2["w"]).all()

    t = cast_state_for_transfer(state)
    assert t["per_param"][0]["m"].dtype == jnp.bfloat16
    r = cast_state_from_transfer(t)
    assert r["per_param"][0]["m"].dtype == jnp.float32
    assert r["step"].dtype == jnp.int32


def test_grad_scale_divides_amp_gradients():
    params = {"w": _w((64, 64))}
    opt = adamw(lr=0.0, quantize_state=False)  # lr=0: isolate state update
    s1 = opt.init(params)
    s2 = opt.init(params)
    g = {"w": jnp.full((64, 64), 8.0)}
    _, s1 = opt.update(g, s1, params, rng=None, grad_scale=8.0)
    gu = {"w": jnp.full((64, 64), 1.0)}
    _, s2 = opt.update(gu, s2, params, rng=None)
    np.testing.assert_allclose(np.asarray(s1["per_param"][0]["m"]),
                               np.asarray(s2["per_param"][0]["m"]), rtol=1e-6)


def test_muon_step():
    qt = quantize_tensor(_w((64, 256), scale=0.5), "int8", group_size=64)
    params = {"w": TrainQTensor(qt=qt,
                                delta=jnp.zeros((64, 256), jnp.float32)),
              "b": _w((64,), seed=5)}
    opt = muon(lr=1e-2)
    state = opt.init(params)
    target = _w((64, 256), seed=6, scale=0.5)

    def loss_fn(params):
        wd = dequantize(params["w"].qt, jnp.float32) + params["w"].delta
        return jnp.mean((wd - target) ** 2) + jnp.mean(params["b"] ** 2)

    losses = []
    rng = jax.random.key(1)
    for _ in range(10):
        rng, k = jax.random.split(rng)
        loss, grads = vag(loss_fn)(params)
        params, state = opt.update(grads, state, params, rng=k)
        losses.append(float(loss))
    assert losses[-1] < losses[0], losses


def test_jitted_full_train_step():
    """End-to-end: jitted loss + grad + optimizer update on a quantized
    2-layer MLP."""
    k = jax.random.key(0)
    params = {
        "fc1": {"weight": _w((256, 128)), "bias": jnp.zeros((256,))},
        "fc2": {"weight": _w((128, 256), seed=1), "bias": jnp.zeros((128,))},
    }
    qp, _ = quantize_model(params, QuantConfig(weights_dtype="int8"))
    tp = convert_model_to_training(qp)
    opt = adamw(lr=1e-2)
    state = opt.init(tp)
    x = _w((32, 128), seed=2)
    y = _w((32, 128), seed=3)

    from sdnq_tpu import qlinear

    def loss_fn(tp):
        h = jax.nn.gelu(qlinear(x, tp["fc1"]["weight"], tp["fc1"]["bias"]))
        out = qlinear(h, tp["fc2"]["weight"], tp["fc2"]["bias"])
        return jnp.mean((out.astype(jnp.float32) - y) ** 2)

    @jax.jit
    def step(tp, state, key):
        loss, grads = vag(loss_fn)(tp)
        tp, state = opt.update(grads, state, tp, rng=key)
        return loss, tp, state

    losses = []
    rng = jax.random.key(4)
    for _ in range(8):
        rng, k2 = jax.random.split(rng)
        loss, tp, state = step(tp, state, k2)
        losses.append(float(loss))
    assert losses[-1] < losses[0], losses


def test_fit_loop_resume_and_nan_guard(tmp_path):
    from sdnq_tpu.train import fit
    qt = quantize_tensor(_w((64, 256), scale=0.5), "int8", group_size=64)
    params = {"w": TrainQTensor(qt=qt,
                                delta=jnp.zeros((64, 256), jnp.float32))}
    opt = adamw(lr=1e-2)
    state0 = {"p": params, "o": opt.init(params)}
    target = _w((64, 256), seed=3, scale=0.5)

    calls = {"n": 0}

    def step_fn(state, key):
        calls["n"] += 1
        def loss_fn(p):
            wd = dequantize(p["w"].qt, jnp.float32) + p["w"].delta
            return jnp.mean((wd - target) ** 2)
        loss, grads = vag(loss_fn)(state["p"])
        if calls["n"] == 3:  # inject one bad step
            loss = jnp.asarray(jnp.nan)
        p, o = opt.update(grads, state["o"], state["p"], rng=key)
        return loss, {"p": p, "o": o}

    ck = str(tmp_path / "ck")
    state = fit(step_fn, state0, 6, ckpt_dir=ck, save_every=2)
    # resume: run 4 more steps from the step-6 checkpoint
    state = fit(step_fn, state0, 10, ckpt_dir=ck, save_every=2)
    from sdnq_tpu.train import latest_checkpoint_step
    assert latest_checkpoint_step(ck) == 10


def test_dynamic_only_training_mode():
    """use_static_quantization=False: fp weights, dynamically quantized
    matmuls, STE grads."""
    from sdnq_tpu.train import DynamicTensor
    from sdnq_tpu import qlinear
    w = DynamicTensor(w=_w((128, 256)))
    x = _w((64, 256), seed=1, scale=0.3)

    def loss(x, w):
        return jnp.sum(qlinear(x, w) ** 2)

    y = qlinear(x, w)
    ref = x @ w.w.T
    assert float(jnp.abs(y - ref).max() / jnp.abs(ref).max()) < 0.05
    gx, gw = jax.grad(loss, argnums=(0, 1))(x, w)
    # STE reference: dL/dW = 2 yᵀ x
    gref_w = 2 * qlinear(x, w).astype(jnp.float32).T @ x
    rel = float(jnp.abs(gw.w - gref_w).max() / jnp.abs(gref_w).max())
    assert rel < 0.05, rel
    assert gx.shape == x.shape
