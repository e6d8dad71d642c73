"""Krylov solvers with AMG preconditioning (SURVEY.md §2 C19-C20, §3.1).

PCG and BiCGStab as `lax.while_loop`s — the whole iteration compiles to one
XLA computation; convergence control is a traced predicate, matching the
reference's `solve(A, b, tol, maxiter, pc=AMG)` surface.  Dot products use
compensated (df64) accumulation so alpha/beta stay accurate at n ~ 1e8.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..ops.blas import dot


def pcg(matvec, precond, b, tol: float, maxiter: int, x0=None,
        compensated: bool = True, dot_fn=None):
    """Preconditioned conjugate gradient.

    matvec(x) -> A x;  precond(r) -> M^-1 r (one AMG cycle).  Stops when
    ||r||/||b|| <= tol.  Returns (x, iters, relres).  `dot_fn` overrides
    the inner product (distributed path: psum-reduced pdot, the
    reference's MPI_Allreduce).
    """
    _dot = dot_fn or partial(dot, compensated=compensated)
    if x0 is None:
        x = jnp.zeros_like(b)
        r = b
    else:
        x = x0
        r = b - matvec(x0)
    bb = _dot(b, b)
    z = precond(r)
    p = z
    rz = _dot(r, z)
    rr = _dot(r, r)
    tol2bb = (tol * tol) * bb

    def cond(state):
        _, _, _, _, rz_, rr_, k = state
        return jnp.logical_and(k < maxiter, rr_ > tol2bb)

    def body(state):
        x, r, z, p, rz_, rr_, k = state
        q = matvec(p)
        pq = _dot(p, q)
        alpha = rz_ / jnp.where(pq != 0, pq, 1.0)
        x = x + alpha * p
        r = r - alpha * q
        z = precond(r)
        rz_new = _dot(r, z)
        beta = rz_new / jnp.where(rz_ != 0, rz_, 1.0)
        p = z + beta * p
        return (x, r, z, p, rz_new, _dot(r, r), k + 1)

    x, r, z, p, rz, rr, k = jax.lax.while_loop(
        cond, body, (x, r, z, p, rz, rr, jnp.int32(0)))
    relres = jnp.sqrt(rr / jnp.where(bb != 0, bb, 1.0))
    return x, k, relres


def bicgstab(matvec, precond, b, tol: float, maxiter: int, x0=None,
             compensated: bool = True, dot_fn=None):
    """Preconditioned BiCGStab (Templates, Barrett et al. 1994) for
    nonsymmetric systems (reference config: anisotropic W-cycle+BiCGStab)."""
    _dot = dot_fn or partial(dot, compensated=compensated)
    if x0 is None:
        x = jnp.zeros_like(b)
        r = b
    else:
        x = x0
        r = b - matvec(x0)
    rhat = r
    bb = _dot(b, b)
    tol2bb = (tol * tol) * bb
    one = jnp.asarray(1.0, dtype=b.dtype)
    v = jnp.zeros_like(b)
    p = jnp.zeros_like(b)

    def cond(state):
        _, _, _, _, _, _, _, rr, k, brk = state
        return (k < maxiter) & (rr > tol2bb) & jnp.logical_not(brk)

    def body(state):
        x, r, v, p, rho, alpha, omega, rr, k, brk = state
        rho_new = _dot(rhat, r)
        breakdown = (rho_new == 0) | (omega == 0)
        beta = (rho_new / jnp.where(rho != 0, rho, 1.0)) * \
               (alpha / jnp.where(omega != 0, omega, 1.0))
        p = r + beta * (p - omega * v)
        phat = precond(p)
        v = matvec(phat)
        rhat_v = _dot(rhat, v)
        alpha = rho_new / jnp.where(rhat_v != 0, rhat_v, 1.0)
        s = r - alpha * v
        shat = precond(s)
        t = matvec(shat)
        tt = _dot(t, t)
        omega = _dot(t, s) / jnp.where(tt != 0, tt, 1.0)
        x = x + alpha * phat + omega * shat
        r = s - omega * t
        return (x, r, v, p, rho_new, alpha, omega, _dot(r, r), k + 1,
                breakdown)

    state = (x, r, v, p, one, one, one, _dot(r, r), jnp.int32(0),
             jnp.asarray(False))
    x, r, v, p, rho, alpha, omega, rr, k, brk = jax.lax.while_loop(
        cond, body, state)
    relres = jnp.sqrt(rr / jnp.where(bb != 0, bb, 1.0))
    return x, k, relres
