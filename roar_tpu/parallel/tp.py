"""Tensor parallelism via GSPMD parameter sharding rules.

The TPU-idiomatic TP: instead of hand-written all-reduces (Megatron-style
torch layers), parameters are placed with NamedShardings over the mesh
'model' axis and XLA's SPMD partitioner inserts the collectives.  For the
FFT transformer blocks this reproduces the classic column/row-parallel
pattern:

- attention qkv projection: output dim sharded ('model' columns)
- attention output projection: input dim sharded ('model' rows) -> XLA emits
  the all-reduce after it
- conv FFN: inner channels sharded (column then row) -> all-reduce after the
  second conv

This replaces the reference's vestigial AppState TP plumbing
(roar/utils/app_state.py:114-305, SURVEY.md §2.10) with a functional knob.
"""

from __future__ import annotations

import re
from typing import Any, List, Sequence, Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# (path regex, spec builder) — first match wins.  Specs are written for the
# parameter layouts of roar_tpu.models.transformer / fastpitch.
FFT_TP_RULES: List[Tuple[str, P]] = [
    # attention: column-parallel qkv, row-parallel output
    (r"dec_attn/qkv_net/kernel$", P(None, "model")),
    (r"dec_attn/qkv_net/bias$", P("model")),
    (r"dec_attn/o_net/kernel$", P("model", None)),
    # conv FFN: [k, in, out] kernels — inner dim sharded
    (r"pos_ff/Conv_0/kernel$", P(None, None, "model")),
    (r"pos_ff/Conv_0/bias$", P("model")),
    (r"pos_ff/Conv_1/kernel$", P(None, "model", None)),
    # conformer FF (Dense [in, out])
    (r"ff1/Dense_0/kernel$", P(None, "model")),
    (r"ff1/Dense_0/bias$", P("model")),
    (r"ff1/Dense_1/kernel$", P("model", None)),
    (r"ff2/Dense_0/kernel$", P(None, "model")),
    (r"ff2/Dense_0/bias$", P("model")),
    (r"ff2/Dense_1/kernel$", P("model", None)),
]


# GPT tensor parallelism (nlp/modules/gpt/gpt.py:63-430 stack): classic
# megatron column/row pairs — fused qkv + MLP up-projections column-parallel,
# the output/down projections row-parallel (XLA emits one all-reduce after
# each pair).  Both layer layouts are covered: unrolled blocks (h_{i}) and
# the `scan_layers=True` stacked layout (h_scan, leading n_layer dim).
# Embedding + lm_head shard the (padded) vocab dim.
GPT_TP_RULES: List[Tuple[str, P]] = [
    # unrolled blocks
    (r"h_\d+/attn/attn/kernel$", P(None, "model")),
    (r"h_\d+/attn/attn/bias$", P("model")),
    (r"h_\d+/attn/proj/kernel$", P("model", None)),
    (r"h_\d+/mlp/fc(?:_1|_2)?/kernel$", P(None, "model")),
    (r"h_\d+/mlp/fc(?:_1|_2)?/bias$", P("model")),
    (r"h_\d+/mlp/proj/kernel$", P("model", None)),
    # scan-stacked blocks (leading layer dim replicated)
    (r"h_scan/attn/attn/kernel$", P(None, None, "model")),
    (r"h_scan/attn/attn/bias$", P(None, "model")),
    (r"h_scan/attn/proj/kernel$", P(None, "model", None)),
    (r"h_scan/mlp/fc(?:_1|_2)?/kernel$", P(None, None, "model")),
    (r"h_scan/mlp/fc(?:_1|_2)?/bias$", P(None, "model")),
    (r"h_scan/mlp/proj/kernel$", P(None, "model", None)),
    # vocab-dim sharding for the embedding table + untied head
    (r"wte/embedding$", P("model", None)),
    (r"lm_head/kernel$", P(None, "model")),
    (r"lm_head/bias$", P("model")),
]

# Vocoder-channel tensor parallelism (SURVEY §2.10: "TP of the FFT/Conformer
# blocks AND the HiFi-GAN channel dimension as a config knob").  The HiFi-GAN
# generator's channel pyramid (upsample_initial_channel 512 -> 256 -> 128 ->
# 64, hifigan_modules.py:164-255) and the MPD/MSD conv channels (:257-476)
# shard over the 'model' axis in the classic column/row alternation:
# every producing conv is column-parallel (output channels sharded) and the
# conv that consumes it is row-parallel (input channels sharded), so XLA
# emits one all-reduce per pair instead of an activation all-gather per
# layer.  WeightNorm scales are per-output-channel: sharded with
# column-parallel kernels, replicated with row-parallel ones (whose norm
# reduction XLA handles across shards).  Discriminator rules come FIRST —
# their paths are prefixed disc_p*/disc_s*, letting the generator rules stay
# generic enough to also match the generator nested inside JETS.
VOCODER_TP_RULES: List[Tuple[str, P]] = [
    # --- MPD: 2D convs, kernel [Kh, Kw, Cin, Cout]; convs_0..4 -> Conv_0..4,
    # conv_post -> Conv_5.  Alternate column (even) / row (odd + post).
    (r"disc_p\d+/Conv_[024]/kernel$", P(None, None, None, "model")),
    (r"disc_p\d+/Conv_[024]/bias$", P("model")),
    (r"disc_p\d+/convs_[024]/Conv_\d+/kernel/scale$", P("model")),
    (r"disc_p\d+/Conv_[135]/kernel$", P(None, None, "model", None)),
    (r"disc_p\d+/", P()),  # anything else under MPD: replicated
    # --- MSD: 1D convs (several grouped), kernel [K, Cin/G, Cout].
    # Column-parallel throughout (row-parallel would split within groups);
    # conv_post (Conv_7) is row-parallel to bring the logits home.
    (r"disc_s\d+/Conv_7/kernel$", P(None, "model", None)),
    (r"disc_s\d+/Conv_[0-6]/kernel$", P(None, None, "model")),
    (r"disc_s\d+/Conv_[0-6]/bias$", P("model")),
    (r"disc_s\d+/convs_\d+/Conv_\d+/kernel/scale$", P("model")),
    (r"disc_s\d+/", P()),
    # --- HiFi-GAN generator ---
    # upsample ConvTranspose stack [K, Cin, Cout]: column-parallel
    (r"ConvTranspose_\d+/kernel$", P(None, None, "model")),
    (r"ConvTranspose_\d+/bias$", P("model")),
    # ups WeightNorm scale is per-INPUT-channel (feature_axes=1, torch
    # dim=0 parity) and the input channels are replicated here; the norm
    # reduction over the sharded out axis is XLA's to distribute
    (r"ups_\d+/ConvTranspose_\d+/kernel/scale$", P()),
    # MRF resblocks: flax numbers the inner convs in call order, so even ids
    # are the dilated first convs (column) and odd ids the closers (row)
    # for both ResBlock1 (convs1_*/convs2_*) and ResBlock2 (convs_*)
    (r"resblocks_\d+_\d+/Conv_[02468]/kernel$", P(None, None, "model")),
    (r"resblocks_\d+_\d+/Conv_[02468]/bias$", P("model")),
    (r"resblocks_\d+_\d+/convs1_\d+/Conv_\d+/kernel/scale$", P("model")),
    (r"resblocks_\d+_\d+/convs_[02468]/Conv_[02468]/kernel/scale$", P("model")),
    (r"resblocks_\d+_\d+/Conv_[13579]/kernel$", P(None, "model", None)),
    # conv_pre (first anonymous Conv at generator scope): column-parallel;
    # conv_post (second): row-parallel.  Matched by scope-local id so the
    # rules also hit `.../generator/Conv_0/...` inside JETS.
    (r"(?:^|/)Conv_0/kernel$", P(None, None, "model")),
    (r"(?:^|/)Conv_0/bias$", P("model")),
    (r"conv_pre/Conv_\d+/kernel/scale$", P("model")),
    (r"(?:^|/)Conv_1/kernel$", P(None, "model", None)),
]


def _path_str(kp) -> str:
    return "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in kp)


def tp_param_shardings(
    params: Any, mesh: Mesh, rules: Sequence[Tuple[str, P]] = FFT_TP_RULES
) -> Any:
    """A NamedSharding pytree matching `params`: TP rules where they apply
    (and divide evenly), replicated elsewhere."""
    compiled = [(re.compile(pat), spec) for pat, spec in rules]
    model_size = mesh.shape.get("model", 1)

    def spec_for(kp, leaf):
        path = _path_str(kp)
        for pat, spec in compiled:
            if pat.search(path):
                if len(spec) > len(leaf.shape):
                    continue  # generic pattern hit a different-rank param
                # only shard when the dimension divides evenly
                ok = True
                for dim, axis in enumerate(spec):
                    if axis == "model" and leaf.shape[dim] % model_size != 0:
                        ok = False
                if ok and model_size > 1:
                    return NamedSharding(mesh, spec)
                break
        return NamedSharding(mesh, P())

    from jax.tree_util import tree_map_with_path

    return tree_map_with_path(spec_for, params)


def shard_params(params: Any, mesh: Mesh, rules=FFT_TP_RULES) -> Any:
    """Place parameters with TP shardings over the mesh."""
    shardings = tp_param_shardings(params, mesh, rules)
    return jax.tree_util.tree_map(jax.device_put, params, shardings)
