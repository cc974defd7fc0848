"""`.roar`-style model bundles: config + weights + artifacts in one tar.

Re-design of roar/core/connectors/save_restore_connector.py:22-578: a `.roar`
archive is a tar containing model_config.yaml, model_weights (flax msgpack),
and registered artifact files (tokenizer assets etc.).  Restore resolves the
task class from the config's `target` and rebuilds parameters.
"""

from __future__ import annotations

import io
import tarfile
from typing import Any, Dict, Optional, Tuple

import jax
import yaml
from flax import serialization

_CONFIG_NAME = "model_config.yaml"
_WEIGHTS_NAME = "model_weights.msgpack"


def save_to(
    path: str,
    cfg: Dict[str, Any],
    params: Any,
    artifacts: Optional[Dict[str, str]] = None,
) -> None:
    """Write a .roar bundle: cfg dict, parameter pytree, artifact files
    (archive-name -> source path)."""
    params = jax.device_get(params)
    blob = serialization.to_bytes(params)
    with tarfile.open(path, "w") as tar:
        cfg_bytes = yaml.safe_dump(cfg, sort_keys=False, allow_unicode=True).encode()
        info = tarfile.TarInfo(_CONFIG_NAME)
        info.size = len(cfg_bytes)
        tar.addfile(info, io.BytesIO(cfg_bytes))
        winfo = tarfile.TarInfo(_WEIGHTS_NAME)
        winfo.size = len(blob)
        tar.addfile(winfo, io.BytesIO(blob))
        for arcname, src in (artifacts or {}).items():
            tar.add(src, arcname=f"artifacts/{arcname}")


def restore_from(
    path: str,
    params_template: Any = None,
    extract_artifacts_to: Optional[str] = None,
) -> Tuple[Dict[str, Any], Any]:
    """Read a bundle; returns (cfg, params).  If `params_template` is given
    the weights are deserialized into its structure, otherwise the raw
    msgpack state dict is returned."""
    with tarfile.open(path, "r") as tar:
        from roar_tpu.config.config import _mark_missing

        cfg = _mark_missing(yaml.safe_load(tar.extractfile(_CONFIG_NAME).read()))
        blob = tar.extractfile(_WEIGHTS_NAME).read()
        if extract_artifacts_to:
            members = [m for m in tar.getmembers() if m.name.startswith("artifacts/")]
            tar.extractall(extract_artifacts_to, members=members, filter="data")
    if params_template is not None:
        params = serialization.from_bytes(params_template, blob)
    else:
        params = serialization.msgpack_restore(blob)
    return cfg, params


def transfer_params(
    target: Any,
    source: Any,
    include: Optional[list] = None,
    exclude: Optional[list] = None,
) -> Tuple[Any, list, list]:
    """Warm start: copy matching leaves from `source` into `target`.

    The analogue of maybe_init_from_pretrained_checkpoint /
    load_part_of_state_dict (roar/core/classes/modelPT.py:1206-1450): leaves
    are matched by their '/'-joined path; `include`/`exclude` are substring
    filters on the path; shape mismatches are skipped.

    Returns (new_target, loaded_paths, skipped_paths).
    """
    from jax.tree_util import tree_flatten_with_path, tree_unflatten

    def path_str(kp) -> str:
        parts = []
        for k in kp:
            parts.append(str(getattr(k, "key", getattr(k, "idx", k))))
        return "/".join(parts)

    src_leaves, _ = tree_flatten_with_path(source)
    src_map = {path_str(kp): v for kp, v in src_leaves}

    tgt_leaves, treedef = tree_flatten_with_path(target)
    new_leaves, loaded, skipped = [], [], []
    for kp, v in tgt_leaves:
        p = path_str(kp)
        candidate = src_map.get(p)
        ok = candidate is not None and getattr(candidate, "shape", None) == getattr(v, "shape", None)
        if ok and include:
            ok = any(s in p for s in include)
        if ok and exclude:
            ok = not any(s in p for s in exclude)
        if ok:
            new_leaves.append(candidate)
            loaded.append(p)
        else:
            new_leaves.append(v)
            skipped.append(p)
    return tree_unflatten(treedef, new_leaves), loaded, skipped
