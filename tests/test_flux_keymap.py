"""Flux (diffusers FluxTransformer2DModel) key-map round trip.

diffusers is not installed in this environment, so the fixture builds a
checkpoint in the diffusers key layout synthetically — splitting this
repo's fused qkv/linear1 operands into to_q/to_k/to_v (+proj_mlp) and
emitting norm_out in diffusers' [scale, shift] chunk order — then streams
it back through ``load_flux`` and gates on forward activation parity.
The layout constants follow diffusers' FluxTransformer2DModel module
names (attn.to_q/add_q_proj/ff.net.0.proj/norm1_context.linear/...).
"""

import json
import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from sdnq_tpu import QuantConfig
from sdnq_tpu.io import load_flux
from sdnq_tpu.models import DiTConfig, dit_forward, init_dit


CFG = DiTConfig(in_channels=4, hidden_size=64, num_heads=2, depth_double=2,
                depth_single=2, txt_dim=32, vec_dim=16, axes_dims=(8, 12, 12),
                guidance_embed=True)


def _split_rows(p, sizes):
    w = np.ascontiguousarray(np.asarray(p["weight"], np.float32))
    b = (np.ascontiguousarray(np.asarray(p["bias"], np.float32))
         if "bias" in p else None)
    out, o = [], 0
    for s in sizes:
        part = {"weight": w[o:o + s]}
        if b is not None:
            part["bias"] = b[o:o + s]
        out.append(part)
        o += s
    return out


def _emit(sd, stem, p):
    # ascontiguousarray: axon-TPU readbacks can be strided and
    # safetensors serializes raw buffers assuming C order
    sd[f"{stem}.weight"] = np.ascontiguousarray(
        np.asarray(p["weight"], np.float32))
    if "bias" in p and p["bias"] is not None:
        sd[f"{stem}.bias"] = np.ascontiguousarray(
            np.asarray(p["bias"], np.float32))


@pytest.fixture(scope="module")
def flux_ckpt(tmp_path_factory):
    from safetensors.numpy import save_file
    params = init_dit(jax.random.key(3), CFG, dtype=jnp.float32)
    d = CFG.hidden_size
    mlp = int(d * CFG.mlp_ratio)
    sd = {}
    _emit(sd, "x_embedder", params["x_embedder"])
    _emit(sd, "context_embedder", params["context_embedder"])
    _emit(sd, "proj_out", params["proj_out"])
    for ours, theirs in [("time_in", "timestep_embedder"),
                         ("vector_in", "text_embedder"),
                         ("guidance_in", "guidance_embedder")]:
        _emit(sd, f"time_text_embed.{theirs}.linear_1", params[ours]["fc1"])
        _emit(sd, f"time_text_embed.{theirs}.linear_2", params[ours]["fc2"])
    # diffusers AdaLayerNormContinuous chunks [scale, shift]; ours is
    # [shift, scale] — swap on the way OUT
    no = params["norm_out"]["linear"]
    w = np.asarray(no["weight"], np.float32)
    b = np.asarray(no["bias"], np.float32)
    w = np.ascontiguousarray(w)
    b = np.ascontiguousarray(b)
    sd["norm_out.linear.weight"] = np.concatenate([w[d:], w[:d]], axis=0)
    sd["norm_out.linear.bias"] = np.concatenate([b[d:], b[:d]], axis=0)
    for i, blk in enumerate(params["transformer_blocks"]):
        pre = f"transformer_blocks.{i}"
        _emit(sd, f"{pre}.norm1.linear", blk["img_mod"]["linear"])
        _emit(sd, f"{pre}.norm1_context.linear", blk["txt_mod"]["linear"])
        for attn, img in (("img_attn", True), ("txt_attn", False)):
            q, k, v = _split_rows(blk[attn]["qkv"], [d, d, d])
            names = (("attn.to_q", "attn.to_k", "attn.to_v") if img else
                     ("attn.add_q_proj", "attn.add_k_proj",
                      "attn.add_v_proj"))
            for n, p in zip(names, (q, k, v)):
                _emit(sd, f"{pre}.{n}", p)
            nq = "attn.norm_q" if img else "attn.norm_added_q"
            nk = "attn.norm_k" if img else "attn.norm_added_k"
            sd[f"{pre}.{nq}.weight"] = np.ascontiguousarray(np.asarray(
                blk[attn]["norm_q"]["weight"], np.float32))
            sd[f"{pre}.{nk}.weight"] = np.ascontiguousarray(np.asarray(
                blk[attn]["norm_k"]["weight"], np.float32))
            _emit(sd, f"{pre}.attn.to_out.0" if img
                  else f"{pre}.attn.to_add_out", blk[attn]["proj"])
        _emit(sd, f"{pre}.ff.net.0.proj", blk["img_mlp"]["fc1"])
        _emit(sd, f"{pre}.ff.net.2", blk["img_mlp"]["fc2"])
        _emit(sd, f"{pre}.ff_context.net.0.proj", blk["txt_mlp"]["fc1"])
        _emit(sd, f"{pre}.ff_context.net.2", blk["txt_mlp"]["fc2"])
    for i, blk in enumerate(params["single_transformer_blocks"]):
        pre = f"single_transformer_blocks.{i}"
        _emit(sd, f"{pre}.norm.linear", blk["norm"]["linear"])
        q, k, v, m = _split_rows(blk["linear1"], [d, d, d, mlp])
        for n, p in zip(("attn.to_q", "attn.to_k", "attn.to_v", "proj_mlp"),
                        (q, k, v, m)):
            _emit(sd, f"{pre}.{n}", p)
        sd[f"{pre}.attn.norm_q.weight"] = np.ascontiguousarray(
            np.asarray(blk["norm_q"]["weight"], np.float32))
        sd[f"{pre}.attn.norm_k.weight"] = np.ascontiguousarray(
            np.asarray(blk["norm_k"]["weight"], np.float32))
        _emit(sd, f"{pre}.proj_out", blk["linear2"])

    path = tmp_path_factory.mktemp("flux")
    save_file(sd, os.path.join(path, "model.safetensors"))
    hd = CFG.hidden_size // CFG.num_heads
    with open(os.path.join(path, "config.json"), "w") as f:
        json.dump({"in_channels": CFG.in_channels,
                   "num_attention_heads": CFG.num_heads,
                   "attention_head_dim": hd,
                   "num_layers": CFG.depth_double,
                   "num_single_layers": CFG.depth_single,
                   "joint_attention_dim": CFG.txt_dim,
                   "pooled_projection_dim": CFG.vec_dim,
                   "axes_dims_rope": list(CFG.axes_dims),
                   "guidance_embeds": True}, f)
    return str(path), params


def _forward(params, cfg):
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.normal(size=(1, 16, cfg.in_channels))
                      .astype(np.float32))
    txt = jnp.asarray(rng.normal(size=(1, 8, cfg.txt_dim))
                      .astype(np.float32))
    t = jnp.full((1,), 0.4, jnp.float32)
    pooled = jnp.asarray(rng.normal(size=(1, cfg.vec_dim))
                         .astype(np.float32))
    return dit_forward(params, img, txt, t, pooled, cfg, guidance=t)


def test_flux_keymap_roundtrip_unquantized(flux_ckpt):
    path, orig = flux_ckpt
    qp, cfg, _ = load_flux(
        path, QuantConfig(weights_dtype="bfloat16"), dtype=jnp.float32)
    assert cfg.hidden_size == CFG.hidden_size
    ref = np.asarray(_forward(orig, CFG), np.float32)
    got = np.asarray(_forward(qp, cfg), np.float32)
    err = np.abs(got - ref).max() / max(np.abs(ref).max(), 1e-6)
    assert err < 2e-2, err  # bf16 rounding only


def _perturbed_ckpt(src_path, tmp_path, mutate):
    """Copy the synthetic checkpoint with its state dict run through
    ``mutate`` (add/drop/rename keys) — the negative-coverage fixtures."""
    import shutil
    from safetensors.numpy import load_file, save_file
    dst = str(tmp_path)
    sd = load_file(os.path.join(src_path, "model.safetensors"))
    sd = mutate(dict(sd))
    save_file(sd, os.path.join(dst, "model.safetensors"))
    shutil.copy(os.path.join(src_path, "config.json"),
                os.path.join(dst, "config.json"))
    return dst


def test_flux_loader_rejects_extra_key(flux_ckpt, tmp_path):
    """An unmapped (e.g. renamed-in-a-new-diffusers-version) key must fail
    loudly, not silently drop (VERDICT r3 #8; reference guarantee:
    loader.py:82-196 load_state_dict(assign=True))."""
    from sdnq_tpu.io.hf import CheckpointCoverageError
    path, _ = flux_ckpt
    bad = _perturbed_ckpt(path, tmp_path, lambda sd: {
        **sd, "transformer_blocks.0.attn.to_q_new.weight":
        np.zeros((4, 4), np.float32)})
    with pytest.raises(CheckpointCoverageError, match="not consumed"):
        load_flux(bad, QuantConfig(weights_dtype="bfloat16"))


def test_flux_loader_rejects_missing_key(flux_ckpt, tmp_path):
    from sdnq_tpu.io.hf import CheckpointCoverageError
    path, _ = flux_ckpt

    def drop(sd):
        del sd["transformer_blocks.0.attn.to_k.weight"]
        return sd
    bad = _perturbed_ckpt(path, tmp_path, drop)
    with pytest.raises(Exception) as ei:
        load_flux(bad, QuantConfig(weights_dtype="bfloat16"))
    # either the coverage check or the qkv fuse (missing operand) fires —
    # loudly, never a silent drop
    assert isinstance(ei.value, (CheckpointCoverageError, KeyError,
                                 ValueError, TypeError)), ei.value


def test_flux_loader_rejects_renamed_key(flux_ckpt, tmp_path):
    from sdnq_tpu.io.hf import CheckpointCoverageError
    path, _ = flux_ckpt

    def rename(sd):
        sd["transformer_blocks.0.attn.query.weight"] = \
            sd.pop("transformer_blocks.0.attn.to_q.weight")
        return sd
    bad = _perturbed_ckpt(path, tmp_path, rename)
    with pytest.raises(Exception) as ei:
        load_flux(bad, QuantConfig(weights_dtype="bfloat16"))
    assert isinstance(ei.value, (CheckpointCoverageError, KeyError,
                                 ValueError, TypeError)), ei.value


def test_flux_loader_non_strict_mode(flux_ckpt, tmp_path):
    """strict=False restores the permissive behavior for intentionally
    partial checkpoints."""
    path, _ = flux_ckpt
    bad = _perturbed_ckpt(path, tmp_path, lambda sd: {
        **sd, "some.extra.stat": np.zeros((2,), np.float32)})
    qp, cfg, _ = load_flux(bad, QuantConfig(weights_dtype="bfloat16"),
                           strict=False)
    assert "transformer_blocks" in qp


def test_flux_keymap_int8_matches_direct_quantize(flux_ckpt):
    """Loader-vs-direct: quantizing the loaded (mapped+fused) tree must
    equal quantizing the original tree in-process — this isolates mapping
    mistakes from quantization noise (a tiny random model amplifies int8
    noise through its modulation gates, so raw-float parity is not a
    stable gate across platforms/precisions)."""
    from sdnq_tpu import quantize_model
    path, orig = flux_ckpt
    qp, cfg, _ = load_flux(path, QuantConfig(weights_dtype="int8"),
                           dtype=jnp.float32)
    qp_direct, _ = quantize_model(
        jax.tree_util.tree_map(lambda x: jnp.asarray(x, jnp.float32), orig),
        QuantConfig(weights_dtype="int8"), arch="FluxTransformer2DModel")
    ref = np.asarray(_forward(qp_direct, CFG), np.float32)
    got = np.asarray(_forward(qp, cfg), np.float32)
    err = np.abs(got - ref).max() / max(np.abs(ref).max(), 1e-6)
    assert err < 2e-2, err
