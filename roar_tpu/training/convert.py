"""Reference-checkpoint conversion: torch state dicts -> roar_tpu pytrees.

Converts the reference's PyTorch FastPitch weights
(roar/collections/tts/modules/fastpitch.py parameter naming) into our flax
FastPitchModule parameter tree, handling the layout differences:

- torch Linear weight [out, in]      -> flax Dense kernel [in, out] (transpose)
- torch Conv1d weight [out, in, k]   -> flax Conv kernel [k, in, out]
- torch LayerNorm weight/bias        -> flax LayerNorm scale/bias
- torch Embedding weight             -> flax Embed embedding

This enables validation-by-weight-transplant (SURVEY.md §7 hard part 6):
a reference-trained checkpoint can be loaded and compared output-for-output.
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import numpy as np


def _t(w):  # torch Linear -> Dense
    return np.asarray(w).T


def _conv(w):  # torch Conv1d [out, in, k] -> flax [k, in, out]
    return np.transpose(np.asarray(w), (2, 1, 0))


def map_fastpitch_state_dict(sd: Dict[str, Any], n_layers: int = 6) -> Dict[str, np.ndarray]:
    """Map reference FastPitchModule state-dict names to flax param paths.

    Returns {'/'-joined flax path: array}.  Unknown keys are skipped (the
    caller reports them).
    """
    out: Dict[str, np.ndarray] = {}

    def put(path: str, value):
        out[path] = np.asarray(value)

    for key, w in sd.items():
        k = key
        # strip common prefixes (Lightning checkpoints carry "fastpitch." /
        # "model." prefixes)
        for pre in ("model.", "fastpitch."):
            if k.startswith(pre):
                k = k[len(pre):]

        # ---- encoder ----
        if k == "encoder.word_emb.weight":
            put("params/encoder_module/word_emb/embedding", w)
        elif k.startswith("encoder.layers.") or k.startswith("decoder.layers."):
            stack = "encoder_module/stack" if k.startswith("encoder.") else "decoder_module"
            rest = k.split("layers.", 1)[1]
            i, sub = rest.split(".", 1)
            base = f"params/{stack}/layers_{i}"
            if sub == "dec_attn.qkv_net.weight":
                put(f"{base}/dec_attn/qkv_net/kernel", _t(w))
            elif sub == "dec_attn.qkv_net.bias":
                put(f"{base}/dec_attn/qkv_net/bias", w)
            elif sub == "dec_attn.o_net.weight":
                put(f"{base}/dec_attn/o_net/kernel", _t(w))
            elif sub == "dec_attn.layer_norm.weight":
                put(f"{base}/dec_attn/layer_norm/LayerNorm_0/scale", w)
            elif sub == "dec_attn.layer_norm.bias":
                put(f"{base}/dec_attn/layer_norm/LayerNorm_0/bias", w)
            elif sub == "pos_ff.CoreNet.0.weight":
                put(f"{base}/pos_ff/Conv_0/kernel", _conv(w))
            elif sub == "pos_ff.CoreNet.0.bias":
                put(f"{base}/pos_ff/Conv_0/bias", w)
            elif sub == "pos_ff.CoreNet.2.weight":
                put(f"{base}/pos_ff/Conv_1/kernel", _conv(w))
            elif sub == "pos_ff.CoreNet.2.bias":
                put(f"{base}/pos_ff/Conv_1/bias", w)
            elif sub == "pos_ff.layer_norm.weight":
                put(f"{base}/pos_ff/layer_norm/LayerNorm_0/scale", w)
            elif sub == "pos_ff.layer_norm.bias":
                put(f"{base}/pos_ff/layer_norm/LayerNorm_0/bias", w)
        # ---- predictors ----
        elif ".layers." in k and (
            k.startswith("duration_predictor.") or k.startswith("pitch_predictor.")
            or k.startswith("energy_predictor.")
        ):
            which = k.split(".", 1)[0]
            rest = k.split("layers.", 1)[1]
            i, sub = rest.split(".", 1)
            base = f"params/{which}_module/layers_{i}"
            if sub == "conv.weight":
                put(f"{base}/Conv_0/kernel", _conv(w))
            elif sub == "conv.bias":
                put(f"{base}/Conv_0/bias", w)
            elif sub == "norm.weight":
                put(f"{base}/norm/LayerNorm_0/scale", w)
            elif sub == "norm.bias":
                put(f"{base}/norm/LayerNorm_0/bias", w)
        elif k.endswith(".fc.weight") and "predictor" in k:
            which = k.split(".", 1)[0]
            put(f"params/{which}_module/fc/kernel", _t(w))
        elif k.endswith(".fc.bias") and "predictor" in k:
            which = k.split(".", 1)[0]
            put(f"params/{which}_module/fc/bias", w)
        # ---- aligner ----
        elif k.startswith("aligner.key_proj.0."):
            put("params/aligner_module/key_proj_0/Conv_0/kernel" if k.endswith("weight")
                else "params/aligner_module/key_proj_0/Conv_0/bias",
                _conv(w) if k.endswith("weight") else w)
        elif k.startswith("aligner.key_proj.2."):
            put("params/aligner_module/key_proj_1/Conv_0/kernel" if k.endswith("weight")
                else "params/aligner_module/key_proj_1/Conv_0/bias",
                _conv(w) if k.endswith("weight") else w)
        elif k.startswith("aligner.query_proj.0."):
            put("params/aligner_module/query_proj_0/Conv_0/kernel" if k.endswith("weight")
                else "params/aligner_module/query_proj_0/Conv_0/bias",
                _conv(w) if k.endswith("weight") else w)
        elif k.startswith("aligner.query_proj.2."):
            put("params/aligner_module/query_proj_1/Conv_0/kernel" if k.endswith("weight")
                else "params/aligner_module/query_proj_1/Conv_0/bias",
                _conv(w) if k.endswith("weight") else w)
        elif k.startswith("aligner.query_proj.4."):
            put("params/aligner_module/query_proj_2/Conv_0/kernel" if k.endswith("weight")
                else "params/aligner_module/query_proj_2/Conv_0/bias",
                _conv(w) if k.endswith("weight") else w)
        # ---- embeddings / projections ----
        elif k == "pitch_emb.weight":
            put("params/pitch_emb/kernel", _conv(w))
        elif k == "pitch_emb.bias":
            put("params/pitch_emb/bias", w)
        elif k == "energy_emb.weight":
            put("params/energy_emb/kernel", _conv(w))
        elif k == "energy_emb.bias":
            put("params/energy_emb/bias", w)
        elif k == "proj.weight":
            put("params/proj/kernel", _t(w))
        elif k == "proj.bias":
            put("params/proj/bias", w)
        elif k == "speaker_emb.weight":
            put("params/speaker_table/embedding", w)
    return out


def _wn_effective(g: np.ndarray, v: np.ndarray) -> np.ndarray:
    """torch weight_norm effective weight: g * v / ||v|| with the norm over
    all dims except dim 0 (torch's default)."""
    g = np.asarray(g, np.float64)
    v = np.asarray(v, np.float64)
    axes = tuple(range(1, v.ndim))
    norm = np.sqrt((v**2).sum(axis=axes, keepdims=True))
    return (g * v / np.maximum(norm, 1e-12)).astype(np.float32)


def _wn_raw(g: np.ndarray, v_flax: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Map torch weight_norm's RAW (g, v) onto flax nn.WeightNorm's
    (direction kernel, scale).  Both frameworks compute
    w = scale * v / ||v|| with the norm grouped per feature (torch dim=0;
    our modules set feature_axes to the matching axis), so carrying
    v -> kernel (already layout-transposed by the caller) and
    g -> scale verbatim is exact for ANY checkpoint — not just a fresh
    init — and keeps gradients and optimizer trajectories in the same
    parameterization as the reference (the recombine-then-redecompose
    mapping this replaces was only gradient-correspondent when g = ||v||)."""
    return v_flax.astype(np.float32), np.asarray(g, np.float32).reshape(-1)


def map_hifigan_generator_state_dict(
    sd: Dict[str, Any], num_kernels: int = 3, resblock: int = 1
) -> Dict[str, np.ndarray]:
    """Map the reference HiFi-GAN Generator state dict
    (roar/collections/tts/modules/hifigan_modules.py:164-255; weight-normed
    convs stored as weight_g/weight_v) to flax Generator param paths
    (models/hifigan.py Generator: nn.WeightNorm-wrapped Conv/ConvTranspose).

    Layer-name layout of the flax module (auto-numbered by construction
    order): conv_pre=Conv_0, ups.{i}=ConvTranspose_{i},
    resblocks.{n} -> resblocks_{n//K}_{n%K} with convs1.{j}=Conv_{2j} /
    convs2.{j}=Conv_{2j+1} (ResBlock1) or convs.{j}=Conv_{j} (ResBlock2),
    conv_post=Conv_1 at the top level.
    """
    out: Dict[str, np.ndarray] = {}
    # group weight_g/weight_v pairs first
    keys = {k[: -len(".weight_g")] for k in sd if k.endswith(".weight_g")}

    def emit(torch_base: str, flax_scope: str, flax_layer: str, transpose):
        g, v = sd[torch_base + ".weight_g"], sd[torch_base + ".weight_v"]
        kernel, scale = _wn_raw(g, transpose(np.asarray(v, np.float32)))
        out[f"params/{flax_layer}/kernel"] = kernel
        out[f"params/{flax_scope}/{flax_layer.split('/')[-1]}/kernel/scale"] = scale
        bias = sd.get(torch_base + ".bias")
        if bias is not None:
            out[f"params/{flax_layer}/bias"] = np.asarray(bias, np.float32)

    def tconv(w):
        """torch ConvTranspose1d [in, out, k] -> flax ConvTranspose [k, in,
        out], spatially FLIPPED: torch's transposed conv is the gradient of
        a correlation (kernel flip), while flax/lax.conv_transpose with
        transpose_kernel=False reuses the correlation orientation.
        torch padding=(k-stride)//2 lines up with flax padding='SAME'
        (verified numerically for the HiFi-GAN k=2*stride cases)."""
        return np.transpose(np.asarray(w), (2, 0, 1))[::-1].copy()

    for base in sorted(keys):
        k = base
        for pre in ("generator.", "model."):
            if k.startswith(pre):
                k = k[len(pre):]
        if k == "conv_pre":
            emit(base, "conv_pre", "Conv_0", _conv)
        elif k == "conv_post":
            emit(base, "conv_post", "Conv_1", _conv)
        elif k.startswith("ups."):
            i = int(k.split(".")[1])
            emit(base, f"ups_{i}", f"ConvTranspose_{i}", tconv)
        elif k.startswith("resblocks."):
            parts = k.split(".")
            if parts[2].isdigit():
                # the reference nests per-upsample-layer groups:
                # resblocks.{up}.{kernel}.convs... (hifigan_modules.py:202-210)
                up, kn = int(parts[1]), int(parts[2])
                which, j = parts[3], int(parts[4])
            else:
                # upstream HiFi-GAN flat naming: resblocks.{n}.convs...
                n = int(parts[1])
                up, kn = n // num_kernels, n % num_kernels
                which, j = parts[2], int(parts[3])
            scope = f"resblocks_{up}_{kn}"
            if resblock == 1:
                idx = 2 * j if which == "convs1" else 2 * j + 1
                wn_scope = f"{scope}/{which}_{j}"
            else:
                idx = j
                wn_scope = f"{scope}/convs_{j}"
            emit(base, wn_scope, f"{scope}/Conv_{idx}", _conv)
    return out


def apply_mapped_params(params: Any, mapped: Dict[str, np.ndarray]) -> Tuple[Any, List[str], List[str]]:
    """Write mapped arrays into the flax tree by path; returns
    (new_params, loaded, missing)."""
    from jax.tree_util import tree_flatten_with_path, tree_unflatten

    leaves, treedef = tree_flatten_with_path(params)
    new_leaves, loaded, missing = [], [], []
    for kp, v in leaves:
        path = "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in kp)
        cand = mapped.get(path)
        if cand is not None and cand.shape == v.shape:
            new_leaves.append(cand.astype(np.asarray(v).dtype))
            loaded.append(path)
        else:
            new_leaves.append(v)
            missing.append(path)
    return tree_unflatten(treedef, new_leaves), loaded, missing


def _conv2d(w):
    """torch Conv2d [out, in, kh, kw] -> flax [kh, kw, in, out]."""
    return np.transpose(np.asarray(w), (2, 3, 1, 0)).copy()


def map_hifigan_mpd_state_dict(sd: Dict[str, Any], periods=(2, 3, 5, 7, 11)) -> Dict[str, np.ndarray]:
    """Map the reference MultiPeriodDiscriminator state dict
    (roar/collections/tts/modules/hifigan_modules.py:257-390; weight-normed
    Conv2d stacks stored as weight_g/weight_v) to flax MultiPeriodDiscriminator
    paths (models/hifigan.py: disc_p{period}/convs_{j} WeightNorm wrappers,
    conv_post = Conv_5).

    With the generator mapping this completes vocoder-checkpoint
    continuation: a reference-trained HiFi-GAN (G + MPD) restarts training
    in roar_tpu without re-warming the discriminator."""
    out: Dict[str, np.ndarray] = {}
    bases = {k[: -len(".weight_g")] for k in sd if k.endswith(".weight_g")}
    for base in sorted(bases):
        k = base
        for pre in ("mpd.", "multiperioddisc."):
            if k.startswith(pre):
                k = k[len(pre):]
        if not k.startswith("discriminators."):
            continue
        parts = k.split(".")
        di = int(parts[1])
        period = periods[di]
        scope = f"disc_p{period}"
        kernel, scale = _wn_raw(
            sd[base + ".weight_g"], _conv2d(np.asarray(sd[base + ".weight_v"]))
        )
        if parts[2] == "convs":
            j = int(parts[3])
            layer, wn = f"Conv_{j}", f"convs_{j}"
        elif parts[2] == "conv_post":
            layer, wn = "Conv_5", "conv_post"
        else:
            continue
        out[f"params/{scope}/{layer}/kernel"] = kernel
        out[f"params/{scope}/{wn}/{layer}/kernel/scale"] = scale
        bias = sd.get(base + ".bias")
        if bias is not None:
            out[f"params/{scope}/{layer}/bias"] = np.asarray(bias, np.float32)
    return out


def map_hifigan_msd_state_dict(
    sd: Dict[str, Any], raw: bool = False,
) -> Tuple[Dict[str, np.ndarray], Dict[str, np.ndarray]]:
    """Map the reference MultiScaleDiscriminator state dict
    (hifigan_modules.py:392-476: scale 0 spectral-normed, scales 1-2
    weight-normed Conv1d stacks) to flax MultiScaleDiscriminator variables.

    Returns (params_map, batch_stats_map).  Two spectral-norm modes:

    raw=False (default, inference/eval): bakes
    W_eff = weight_orig / (u^T W v) — torch's eval-mode effective weight —
    into the flax kernel and seeds flax's power-iteration state with
    W_eff's true top right-singular vector, making flax's one-step sigma
    equal W_eff's spectral norm.  Eval-forward-exact even for an
    UNCONVERGED fresh torch module (flax iterates once even with
    update_stats=False, torch eval does not — baking sidesteps that).

    raw=True (training continuation / trajectory equivalence): carries
    weight_orig -> kernel (layout-transposed) and torch's u verbatim.
    Both frameworks then run the SAME train-mode power-iteration recurrence
    (v = normalize(u W^T); u' = normalize(v W); sigma = v W u'), so every
    subsequent train-mode sigma, effective weight, gradient, and optimizer
    update bit-corresponds — the right mode when resuming GAN training
    from a torch checkpoint (tests/test_train_equivalence.py).
    """
    params: Dict[str, np.ndarray] = {}
    stats: Dict[str, np.ndarray] = {}

    def put_conv(scope: str, j_layer: str, wn_scope: str, w_flax: np.ndarray,
                 bias, spectral: bool, u_t=None, sigma_t=None):
        if spectral:
            params[f"params/{scope}/{j_layer}/kernel"] = w_flax.astype(np.float32)
            if raw:
                # torch u is the LEFT vector of [out, in*k]; flax u is the
                # RIGHT vector of [(k*in), out] — same out-axis role
                u0 = np.asarray(u_t, np.float32)[None, :]
                sig = np.float32(sigma_t)
            else:
                m = w_flax.reshape(-1, w_flax.shape[-1]).astype(np.float64)
                # top right-singular vector of the flax-layout matrix
                _, _, vh = np.linalg.svd(m, full_matrices=False)
                u0, sig = vh[0][None, :].astype(np.float32), np.float32(1.0)
            stats[f"batch_stats/{scope}/{wn_scope}/{j_layer}/kernel/u"] = u0
            stats[f"batch_stats/{scope}/{wn_scope}/{j_layer}/kernel/sigma"] = sig
        else:
            kernel, scale = w_flax  # (g, v_flax) passed through
            params[f"params/{scope}/{j_layer}/kernel"] = kernel
            params[f"params/{scope}/{wn_scope}/{j_layer}/kernel/scale"] = scale
        if bias is not None:
            params[f"params/{scope}/{j_layer}/bias"] = np.asarray(bias, np.float32)

    layers = {k.split(".weight_orig")[0] for k in sd if k.endswith(".weight_orig")}
    layers |= {k.split(".weight_g")[0] for k in sd if k.endswith(".weight_g")}
    for base in sorted(layers):
        k = base
        for pre in ("msd.", "multiscaledisc."):
            if k.startswith(pre):
                k = k[len(pre):]
        if not k.startswith("discriminators."):
            continue
        parts = k.split(".")
        di = int(parts[1])
        scope = f"disc_s{di}"
        if parts[2] == "convs":
            j = int(parts[3])
            j_layer, wn_scope = f"Conv_{j}", f"convs_{j}"
        elif parts[2] == "conv_post":
            j_layer, wn_scope = "Conv_7", "conv_post"
        else:
            continue
        bias = sd.get(base + ".bias")
        if base + ".weight_orig" in sd:  # spectral norm (scale 0)
            w_orig = np.asarray(sd[base + ".weight_orig"], np.float64)
            u = np.asarray(sd[base + ".weight_u"], np.float64)
            v = np.asarray(sd[base + ".weight_v"], np.float64)
            sigma = float(u @ w_orig.reshape(w_orig.shape[0], -1) @ v)
            if raw:
                put_conv(scope, j_layer, wn_scope, _conv(w_orig), bias, True,
                         u_t=u, sigma_t=sigma)
            else:
                put_conv(scope, j_layer, wn_scope, _conv(w_orig / sigma), bias,
                         True)
        else:  # weight norm (scales 1-2): raw (g, v), see _wn_raw
            put_conv(
                scope, j_layer, wn_scope,
                _wn_raw(sd[base + ".weight_g"],
                        _conv(np.asarray(sd[base + ".weight_v"]))),
                bias, False,
            )
    return params, stats
