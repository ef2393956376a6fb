"""Sinkhorn-Knopp optimal transport iteration.

Re-design of `/root/reference/vsrd/modules/sinkhorn_knopp.py:5-28`
([OTA](https://arxiv.org/abs/2103.14259)) as a pure jax function with a
`fori_loop` over log-domain updates.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sinkhorn_knopp(cost, row_marginals, col_marginals, gamma=0.1,
                   num_steps=50, epsilon=1e-6):
    """Transport plan for cost ``[R, C]`` with marginals ``d [R]``, ``s [C]``."""
    d = jnp.log(row_marginals + epsilon)
    s = jnp.log(col_marginals + epsilon)
    m = -cost / gamma

    def body(_, carry):
        u, v = carry
        u = d - jax.nn.logsumexp(m + v[None, :], axis=1)
        v = s - jax.nn.logsumexp(m + u[:, None], axis=0)
        return u, v

    u0 = jnp.ones_like(d)
    v0 = jnp.ones_like(s)
    u, v = jax.lax.fori_loop(0, num_steps, body, (u0, v0))
    return jnp.exp(u[:, None] + m + v[None, :])
