#!/usr/bin/env python
"""Multi-chip scaling model from the compiled (partitioned) HLO.

Single-chip hardware cannot run a pod, but the collectives a pod WOULD run
are fully determined at compile time: GSPMD inserts them during SPMD
partitioning, with shapes and replica groups in the optimized HLO.  This
tool compiles the FULL flagship train step over a virtual mesh (the same
path the driver's dryrun_multichip validates), extracts every collective,
prices it with the standard ring-cost model, and emits a falsifiable
per-step prediction (VERDICT r3 #10, SURVEY §5.8):

    comm_time(axis) = sum_ops ring_factor(op) * bytes(op) / link_bw(axis)
    efficiency(n)   = t_compute / (t_compute + max(0, comm - overlappable))

Ring factors: all-reduce 2(k-1)/k, all-gather/reduce-scatter (k-1)/k,
collective-permute 1, all-to-all (k-1)/k.

The mesh axis of each collective is recovered from its replica groups:
a group varying only along the 'model' coordinate of the device grid is a
model-axis (TP) collective, etc.  Axes are then priced with per-axis link
bandwidth: ICI for intra-slice axes, DCN for the slice axis of a hybrid
mesh (parallel/mesh.py make_hybrid_mesh).

Bandwidth assumptions are CLI knobs, not constants: defaults are the
public v5e numbers (1600 Gbps ICI per chip per direction -> 200 GB/s;
25 GB/s DCN per host), and every prediction line restates the number it
was priced with so the prediction is falsifiable when hardware exists.

Usage:
    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python scripts/benchmarks/scaling_model.py --model fastpitch \
        --mesh dp8 --mesh dp4tp2 [--step-ms 43.8] [--json]
"""

import argparse
import json
import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import numpy as np

# ring-cost multipliers: fraction of the op's FULL (unpartitioned) payload
# each participant moves over its links
RING = {
    "all-reduce": lambda k: 2 * (k - 1) / k,
    "all-gather": lambda k: (k - 1) / k,
    "reduce-scatter": lambda k: (k - 1) / k,
    "collective-permute": lambda k: 1.0,
    "all-to-all": lambda k: (k - 1) / k,
}

_DTYPE_BYTES = {
    "f64": 8, "f32": 4, "f16": 2, "bf16": 2, "s64": 8, "u64": 8,
    "s32": 4, "u32": 4, "s16": 2, "u16": 2, "s8": 1, "u8": 1, "pred": 1,
}

_SHAPE_RE = re.compile(r"(f64|f32|f16|bf16|s64|u64|s32|u32|s16|u16|s8|u8|pred)\[([\d,]*)\]")
_GROUPS_RE = re.compile(r"replica_groups=\{(\{[^=]*\})\}")
_OP_RE = re.compile(
    r"^\s*(?:%\S+\s*=\s*)?"  # optional result binding
    r"(\([^)]*\)|\S+)\s+"     # result shape (tuple or single)
    r"(all-reduce|all-gather|reduce-scatter|collective-permute|all-to-all)"
    r"(?:-start)?\(", re.M)


def _shape_bytes(text: str) -> int:
    total = 0
    for dt, dims in _SHAPE_RE.findall(text):
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * _DTYPE_BYTES[dt]
    return total


def classify_axis(group: list, coords: dict) -> str:
    """Name the mesh axes along which `group`'s device coordinates vary."""
    varying = set()
    names = list(next(iter(coords.values())).keys()) if coords else []
    for ax in names:
        if len({coords[d][ax] for d in group}) > 1:
            varying.add(ax)
    return "+".join(sorted(varying)) or "replica"


def collect_collectives(hlo: str, coords: dict):
    """Parse optimized HLO -> per-collective (kind, axis, k, full_bytes)."""
    out = []
    for m in _OP_RE.finditer(hlo):
        shape_txt, kind = m.group(1), m.group(2)
        line = hlo[m.start(): hlo.index("\n", m.end())]
        gm = _GROUPS_RE.search(line)
        if gm:
            groups = [
                [int(x) for x in g.split(",") if x.strip()]
                for g in re.findall(r"\{([\d,\s]*)\}", gm.group(1))
            ]
        else:
            groups = [sorted(coords.keys())]
        k = max(len(g) for g in groups) if groups else 1
        if k <= 1:
            continue
        shard_bytes = _shape_bytes(shape_txt)
        # HLO shapes are per-participant shards; the ring moves ~the full
        # logical payload per group, = shard_bytes * k for gather/scatter
        # semantics.  For all-reduce the input shard IS the full payload.
        if kind in ("all-gather",):
            full = shard_bytes  # result shape is already the gathered one
        elif kind in ("reduce-scatter",):
            full = shard_bytes * k  # result is the scattered shard
        else:
            full = shard_bytes
        axis = classify_axis(groups[0], coords) if coords else "?"
        out.append({
            "kind": kind, "axis": axis, "k": k,
            "payload_mb": full / 2**20,
            "wire_mb": RING[kind](k) * full / 2**20,
        })
    return out


def build_step(model: str, mesh_spec: str, seed: int = 0):
    """Compile the flagship train step over the requested virtual mesh and
    return (lowered-compiled text, device coords, meta)."""
    import __graft_entry__ as ge

    m0 = re.fullmatch(r"dp(\d+)(?:tp(\d+))?", mesh_spec)
    n_dev = int(m0.group(1)) * int(m0.group(2) or 1) if m0 else 8
    # self-bootstrap the virtual CPU platform (sitecustomize pre-registers
    # the TPU plugin, so env vars alone are not enough — same recipe as the
    # driver's dryrun)
    jax = ge._force_virtual_cpu_devices(n_dev)
    import jax.numpy as jnp

    from roar_tpu.parallel import FFT_TP_RULES, make_mesh
    from roar_tpu.training import Trainer, build_optimizer
    from roar_tpu.ops.priors import beta_binomial_prior_np

    m = re.fullmatch(r"dp(\d+)(?:tp(\d+))?", mesh_spec)
    if not m:
        raise SystemExit(f"bad --mesh {mesh_spec}; want dpN or dpNtpM")
    dp, tp = int(m.group(1)), int(m.group(2) or 1)
    mesh = make_mesh(data=dp, model=tp) if tp > 1 else make_mesh(data=dp)
    coords = {}
    arr = mesh.devices
    for idx, dev in np.ndenumerate(arr):
        coords[dev.id] = dict(zip(mesh.axis_names, idx))

    if model != "fastpitch":
        raise SystemExit("only fastpitch is wired up (JETS compile on CPU "
                         "exceeds practical budgets; same method applies)")

    module = ge._flagship()
    n_mel, d = 80, 384
    b, t_text, t_mel = 4 * dp, 128, 864
    rng = np.random.default_rng(seed)
    batch = {
        "text": rng.integers(1, 256, size=(b, t_text)).astype(np.int32),
        "text_len": np.full((b,), t_text, np.int32),
        "spec": rng.standard_normal((b, t_mel, n_mel)).astype(np.float32),
        "mel_len": np.full((b,), t_mel, np.int32),
        "pitch": rng.standard_normal((b, t_mel)).astype(np.float32),
        "prior": np.broadcast_to(
            beta_binomial_prior_np(t_text, t_mel), (b, t_mel, t_text)
        ).copy(),
    }

    from roar_tpu.losses import (
        bin_loss, duration_loss, forward_sum_loss, mel_loss, pitch_loss,
    )

    def loss_fn(p, b_, rng_, epoch):
        out = module.apply(
            p, b_["text"], pitch=b_["pitch"], spec=b_["spec"],
            attn_prior=b_["prior"], mel_lens=b_["mel_len"],
            input_lens=b_["text_len"], deterministic=False,
            rngs={"dropout": rng_},
        )
        loss = (
            mel_loss(out["spect"], b_["spec"])
            + duration_loss(out["log_durs_predicted"], out["attn_hard_dur"], b_["text_len"])
            + pitch_loss(out["pitch_predicted"], out["pitch"], b_["text_len"])
            + forward_sum_loss(out["attn_logprob"], b_["text_len"], b_["mel_len"])
            + bin_loss(out["attn_hard"], out["attn_soft"])
        )
        return loss, {"loss": loss}

    opt = build_optimizer({"name": "adamw", "lr": 1e-3}, gradient_clip_val=10.0)
    trainer = Trainer(
        loss_fn=loss_fn, optimizer=opt, mesh=mesh,
        tp_rules=FFT_TP_RULES if tp > 1 else None,
    )
    params = module.init(
        {"params": jax.random.PRNGKey(0)},
        jnp.asarray(batch["text"]), pitch=jnp.asarray(batch["pitch"]),
        spec=jnp.asarray(batch["spec"]), attn_prior=jnp.asarray(batch["prior"]),
        mel_lens=jnp.asarray(batch["mel_len"]),
        input_lens=jnp.asarray(batch["text_len"]),
    )
    state = trainer.init_state(params)
    gbatch = trainer._place(batch)
    # trainer._train_step is the jitted step (make_train_step); lower+compile
    # runs GSPMD partitioning without executing anything
    lowered = trainer._train_step.lower(state, gbatch, jax.random.PRNGKey(1), 0)
    hlo = lowered.compile().as_text()
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(params))
    return hlo, coords, {
        "mesh": mesh_spec, "dp": dp, "tp": tp, "global_batch": b,
        "params": int(n_params),
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="fastpitch")
    p.add_argument("--mesh", action="append", default=None,
                   help="dpN or dpNtpM (repeatable)")
    p.add_argument("--ici-gbps", type=float, default=200.0,
                   help="per-chip per-direction ICI GB/s (v5e public: 200)")
    p.add_argument("--dcn-gbps", type=float, default=25.0)
    p.add_argument("--step-ms", type=float, default=None,
                   help="measured single-chip compute ms at the same "
                        "PER-CHIP shapes (README bench) for the efficiency "
                        "prediction")
    p.add_argument("--json", action="store_true")
    args = p.parse_args()

    reports = []
    for spec in args.mesh or ["dp8", "dp4tp2"]:
        hlo, coords, meta = build_step(args.model, spec)
        cols = collect_collectives(hlo, coords)
        by_axis = {}
        for c in cols:
            a = by_axis.setdefault(
                c["axis"], {"ops": 0, "payload_mb": 0.0, "wire_mb": 0.0})
            a["ops"] += 1
            a["payload_mb"] += c["payload_mb"]
            a["wire_mb"] += c["wire_mb"]
        pred = {}
        total_ms = 0.0
        for axis, a in by_axis.items():
            bw = args.dcn_gbps if axis == "slice" else args.ici_gbps
            t = a["wire_mb"] / 1024 / bw * 1e3
            pred[axis] = {
                **{k: round(v, 2) for k, v in a.items()},
                "link_gbps": bw, "pred_ms": round(t, 3),
            }
            total_ms += t
        rep = {**meta, "collectives": pred,
               "pred_comm_ms": round(total_ms, 3)}
        if args.step_ms:
            rep["assumed_compute_ms"] = args.step_ms
            rep["pred_efficiency_no_overlap"] = round(
                args.step_ms / (args.step_ms + total_ms), 4)
        reports.append(rep)
        if not args.json:
            print(f"\n== {spec}  (global batch {meta['global_batch']}, "
                  f"{meta['params']/1e6:.1f}M params) ==")
            for axis, d in pred.items():
                print(f"  {axis:<8} {d['ops']:>3} ops  "
                      f"payload {d['payload_mb']:>9.1f} MB  "
                      f"wire {d['wire_mb']:>9.1f} MB  "
                      f"@{d['link_gbps']:.0f} GB/s -> {d['pred_ms']:.3f} ms")
            print(f"  total predicted comm: {total_ms:.3f} ms/step")
            if args.step_ms:
                print(f"  efficiency vs {args.step_ms} ms compute "
                      f"(zero overlap): {rep['pred_efficiency_no_overlap']:.1%}")
    if args.json:
        print(json.dumps(reports))


if __name__ == "__main__":
    main()
