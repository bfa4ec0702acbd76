"""OLSS — Optimal Linear Subspace Search scheduler (learned fast sampler).

Capability parity: reference diffusion/olss_scheduler/olss.py (OLSSSolver
:74-185, OLSSScheduler :23-71; paper arXiv:2305.14677): record a teacher
trajectory (x_i, eps_i) from a full DDIM run, greedily pick N timesteps
under a bisected error limit, and least-squares fit each accelerated state
as a linear combination  x_{i+1} ≈ wx[i]·xT + Σ_j we[i,j]·eps_j.

TPU shape: the teacher path is collected in ONE lax.scan (no per-step host
round-trips); the solver is offline host-side numpy (float64 lstsq); the
student sampler is statically unrolled over its N (~10) steps so XLA sees a
single fused graph.
"""

import jax
import jax.numpy as jnp
import numpy as np


# ------------------------------------------------------------------ teacher
def ddim_collect_path(denoise_fn, shape, schedule, num_steps=100, rng=None,
                      x_init=None):
    """Run the deterministic DDIM teacher and record the trajectory.

    Returns (t_path [T] int32 descending, x_path [T+1, B, ...], e_path
    [T, B, ...]) — the same artifacts the reference's SchedulerWrapper
    catches per step (olss.py:189-225), but produced by one scanned run.
    """
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    step_indices = np.linspace(0, schedule.num_timesteps - 1, num_steps,
                               dtype=np.int64)[::-1].copy()
    x0 = x_init if x_init is not None else jax.random.normal(
        rng, shape, jnp.float32)
    acp = schedule.alphas_cumprod
    t_arr = jnp.asarray(step_indices)

    def body(x, i):
        t = t_arr[i]
        t_prev = jnp.where(i + 1 < num_steps,
                           t_arr[jnp.minimum(i + 1, num_steps - 1)], -1)
        a_t = acp[t]
        a_prev = jnp.where(t_prev >= 0, acp[jnp.maximum(t_prev, 0)], 1.0)
        eps = denoise_fn(x, jnp.full((shape[0],), t, jnp.int32))
        pred_x0 = (x - jnp.sqrt(1 - a_t) * eps) / jnp.sqrt(a_t)
        x_next = jnp.sqrt(a_prev) * pred_x0 + jnp.sqrt(1 - a_prev) * eps
        return x_next, (x, eps)

    x_final, (xs, es) = jax.lax.scan(body, x0, jnp.arange(num_steps))
    x_path = jnp.concatenate([xs, x_final[None]], axis=0)
    return step_indices.astype(np.int32), np.asarray(x_path), np.asarray(es)


# ------------------------------------------------------------------- solver
def _solve_step(xT_flat, e_prev_flat, x_goal_flat):
    """lstsq fit of x_goal over [xT, eps_0..eps_k] (reference olss.py:84-98).
    All math float64 on host."""
    X = np.concatenate([xT_flat, e_prev_flat], axis=0).astype(np.float64).T
    y = x_goal_flat.astype(np.float64)
    coef, *_ = np.linalg.lstsq(X, y, rcond=None)
    err = float(np.mean((X @ coef - y) ** 2))
    return coef[0], coef[1:], err


def _flatten(a):
    return a.reshape(a.shape[0], -1) if a.ndim > 1 else a[None]


def resolve_diffusion_process(steps_accelerate, t_path, x_path, e_path,
                              i_path=None):
    """Fit (wx, we) on a chosen sub-path (reference olss.py:100-122)."""
    steps_inference = t_path.shape[0]
    if i_path is None:
        i_path = np.arange(0, steps_inference,
                           steps_inference // steps_accelerate
                           )[:steps_accelerate]
    i_path = np.asarray(i_path)
    t_sub = t_path[i_path]
    x_flat = _flatten(x_path.reshape(x_path.shape[0], -1))
    e_flat = e_path.reshape(e_path.shape[0], -1)
    x_sub = np.concatenate([x_flat[i_path], x_flat[-1:]], axis=0)
    e_sub = e_flat[i_path]
    n = len(i_path)
    wx = np.zeros(n, np.float64)
    we = np.zeros((n, n), np.float64)
    for i in range(n):
        wx[i], we[i, :i + 1], _ = _solve_step(
            x_sub[0:1], e_sub[:i + 1], x_sub[i + 1])
    return t_sub, wx, we


def _search_next_step(x_prev, e_prev, x_flat, i_lower, max_error):
    """Largest reachable trajectory index under max_error (bisection,
    reference olss.py:124-137)."""
    i_upper = len(x_flat) - 1
    while i_upper > i_lower:
        i_mid = (i_lower + i_upper + 1) // 2
        _, _, err = _solve_step(x_prev, e_prev, x_flat[i_mid])
        if err > max_error:
            i_upper = i_mid - 1
        else:
            i_lower = i_mid
    return i_lower


def _search_path(max_steps, x_flat, e_flat, max_error):
    """Greedy max-error-bounded path (reference olss.py:139-160)."""
    n = e_flat.shape[0]
    i_path = [0]
    for step in range(max_steps):
        x_prev = x_flat[i_path[step:step + 1]]
        e_prev = e_flat[i_path]
        i_next = _search_next_step(x_prev, e_prev, x_flat,
                                   i_path[step] + 1, max_error)
        if i_next == n:
            return i_path
        i_path.append(i_next)
    return None


def fit_olss(t_path, x_path, e_path, num_accelerate_steps, max_iter=30):
    """Bisect the error limit until the greedy path fits in N steps, then
    lstsq-fit the scheduler weights (reference olss.py:162-185).

    Returns (timesteps [N] int32, wx [N], we [N, N]) — feed to olss_sample.
    """
    x_flat = x_path.reshape(x_path.shape[0], -1)
    e_flat = e_path.reshape(e_path.shape[0], -1)
    err_l, err_r = 0.0, 10.0
    for _ in range(max_iter):
        err_m = (err_l + err_r) / 2
        path = _search_path(num_accelerate_steps, x_flat, e_flat, err_m)
        if path is None:
            err_l = err_m
        else:
            err_r = err_m
    path = _search_path(num_accelerate_steps, x_flat, e_flat, err_r)
    return resolve_diffusion_process(num_accelerate_steps, t_path, x_path,
                                     e_path, i_path=path)


# ------------------------------------------------------------------ student
def olss_sample(denoise_fn, xT, timesteps, wx, we):
    """The learned N-step sampler (reference OLSSSchedulerModel.forward
    :15-20): x = wx[t]·xT + Σ we[t, :t+1]·eps. N is small and static — the
    loop is Python-unrolled so XLA fuses the whole program."""
    timesteps = [int(t) for t in np.asarray(timesteps)]
    wx = jnp.asarray(wx, jnp.float32)
    we = jnp.asarray(we, jnp.float32)
    x = xT
    eps_hist = []
    b = xT.shape[0]
    for i, t in enumerate(timesteps):
        eps = denoise_fn(x, jnp.full((b,), t, jnp.int32))
        eps_hist.append(eps)
        x = wx[i] * xT
        for j in range(i + 1):
            x = x + we[i, j] * eps_hist[j]
        x = x.astype(xT.dtype)
    return x


def save_olss(path, timesteps, wx, we):
    np.savez(path, timesteps=np.asarray(timesteps, np.int32),
             wx=np.asarray(wx), we=np.asarray(we))


def load_olss(path):
    d = np.load(path)
    return d["timesteps"], d["wx"], d["we"]
