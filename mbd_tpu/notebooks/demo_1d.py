# %% [markdown]
# # Model-Based Diffusion in 1-D
#
# The conceptual spec of the algorithm (equivalent of the reference's
# mbd/notebooks/01_1d_demo.py): a double-well objective, the forward
# noising process evolving the target density toward a Gaussian, and the
# reverse process recovered by Monte-Carlo score ascent — the same update
# the trajectory planner applies per diffusion step.
#
# Run as a script (writes results/demo_1d.png) or open as a notebook
# (percent format).

# %%
import os

import numpy as np
import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402


def objective(y):
    """Double well with asymmetric depths: global optimum near y = +0.6."""
    return -(y ** 2 - 0.36) ** 2 + 0.3 * y


def target_density(y, temp=0.05):
    p = np.exp(objective(y) / temp)
    return p / np.trapezoid(p, y)


# %% forward process: p_i(y) = ∫ N(y; sqrt(ᾱ_i) y0, 1-ᾱ_i) p0(y0) dy0
def forward_densities(y, p0, alphas_bar):
    out = []
    for ab in alphas_bar:
        mu = np.sqrt(ab) * y[:, None]
        var = 1.0 - ab
        K = np.exp(-0.5 * (y[None, :] - mu) ** 2 / var) / np.sqrt(
            2 * np.pi * var)
        pi = (K * p0[:, None]).sum(0)
        pi /= np.trapezoid(pi, y)
        out.append(pi)
    return np.stack(out)


# %% reverse process by MC score ascent (the planner's update rule)
def reverse_mc(rng, alphas, alphas_bar, sigmas, n_steps, temp=0.05,
               n_mc=512):
    Ybar = 0.0
    traj = [Ybar]
    for i in range(n_steps - 1, 0, -1):
        Yi = Ybar * np.sqrt(alphas_bar[i])
        Y0s = rng.normal(Ybar, sigmas[i], size=n_mc)
        logp = objective(Y0s) / temp
        logp -= logp.max()
        w = np.exp(logp)
        w /= w.sum()
        bary = (w * Y0s).sum()
        score = (-Yi + np.sqrt(alphas_bar[i]) * bary) / (1 - alphas_bar[i])
        Yim1 = (Yi + (1 - alphas_bar[i]) * score) / np.sqrt(alphas[i])
        Ybar = Yim1 / np.sqrt(alphas_bar[i - 1])
        traj.append(Ybar)
    return np.array(traj)


# %%
def main(out_path="results/demo_1d.png", n_steps=100):
    y = np.linspace(-2, 2, 400)
    betas = np.linspace(1e-4, 2e-2, n_steps)
    alphas = 1 - betas
    alphas_bar = np.cumprod(alphas)
    sigmas = np.sqrt(1 - alphas_bar)

    p0 = target_density(y)
    dens = forward_densities(y, p0, alphas_bar)

    fig, axes = plt.subplots(1, 3, figsize=(12, 3.2))
    axes[0].plot(y, objective(y))
    axes[0].set_title("objective J(y)")

    im = axes[1].imshow(dens.T, aspect="auto", origin="lower",
                        extent=[0, n_steps, y[0], y[-1]], cmap="viridis")
    axes[1].set_title("forward density evolution")
    axes[1].set_xlabel("diffusion step i")
    fig.colorbar(im, ax=axes[1])

    rng = np.random.default_rng(0)
    for s in range(8):
        traj = reverse_mc(np.random.default_rng(s), alphas, alphas_bar,
                          sigmas, n_steps)
        axes[2].plot(np.arange(len(traj))[::-1], traj, alpha=0.7)
    axes[2].axhline(0.6, color="k", ls="--", lw=0.8, label="optimum")
    axes[2].set_title("reverse MC score ascent")
    axes[2].set_xlabel("diffusion step i (reversed)")
    axes[2].legend()

    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    fig.tight_layout()
    fig.savefig(out_path, dpi=110)
    print(f"wrote {out_path}")
    return dens, traj


if __name__ == "__main__":
    main()
