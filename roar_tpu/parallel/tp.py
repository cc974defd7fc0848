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
