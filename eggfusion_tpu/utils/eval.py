"""Trajectory and render evaluation.

Equivalent of the reference `src/utils/eval_utils.py`:
  ate_rmse           <- `eval_traj_func` (Horn closed-form alignment, x100 cm,
                        `eval_utils.py:44-88`)
  matrix_to_tum      <- `matrix_to_tum_format` (`eval_utils.py:34-42`)
  eval_render        <- `eval_render_func` PSNR / SSIM / depth-L1
                        (`eval_utils.py:93-109`) — and actually WIRED into the
                        pipeline, which the reference never did (its
                        `eval_render` config flag is dangling, SURVEY.md §5).

LPIPS requires a pretrained AlexNet; it is provided when torch +
torchmetrics weights are available locally, else reported as NaN (zero-egress
environments cannot download weights).
"""
from __future__ import annotations

import numpy as np
from scipy.spatial.transform import Rotation


def horn_align(model: np.ndarray, data: np.ndarray):
    """Closed-form Horn alignment of two (3, N) trajectories.

    Returns (rot, trans, per-point translational error)."""
    model_c = model - model.mean(axis=1, keepdims=True)
    data_c = data - data.mean(axis=1, keepdims=True)
    W = model_c @ data_c.T
    U, _, Vh = np.linalg.svd(W.T)
    S = np.eye(3)
    if np.linalg.det(U) * np.linalg.det(Vh) < 0:
        S[2, 2] = -1
    rot = U @ S @ Vh
    trans = data.mean(axis=1, keepdims=True) - rot @ model.mean(axis=1, keepdims=True)
    err = rot @ model + trans - data
    return rot, trans, np.sqrt(np.sum(err * err, axis=0))


def ate_rmse(poses_ref: np.ndarray, poses_est: np.ndarray) -> float:
    """ATE RMSE in centimeters (reference scaling x100, `eval_utils.py:87`).

    poses_*: (N, 3) translations."""
    est = np.asarray(poses_est, np.float64).T
    ref = np.asarray(poses_ref, np.float64).T
    _, _, err = horn_align(est, ref)
    return float(np.sqrt(err @ err / len(err)) * 100.0)


def cumulative_ate(poses_ref: np.ndarray, poses_est: np.ndarray) -> np.ndarray:
    """ATE RMSE (cm) of every trajectory prefix, O(n) total.

    Equivalent to `[ate_rmse(ref[:k], est[:k]) for k in 1..n]` (the reference
    plots this curve, `system.py:167-196`) but runs on running sums instead of
    a Horn alignment per prefix: with centered cross-covariance W_k and
    centered square sums S_mm/S_dd, the aligned residual is closed-form
    ||err||^2 = S_mm + S_dd - 2 * sum_i d_i * sigma_i(W_k) (d = (1,1,det
    correction)), so each prefix costs one 3x3 SVD — O(n) overall instead of
    the naive sweep's O(n^2) (minutes at TUM-length sequences)."""
    m = np.asarray(poses_est, np.float64)  # horn_align's `model`
    d = np.asarray(poses_ref, np.float64)
    n = len(m)
    out = np.empty(n)
    sum_m = np.zeros(3)
    sum_d = np.zeros(3)
    sum_mm = 0.0
    sum_dd = 0.0
    sum_W = np.zeros((3, 3))
    for k in range(n):
        sum_m += m[k]
        sum_d += d[k]
        sum_mm += m[k] @ m[k]
        sum_dd += d[k] @ d[k]
        sum_W += np.outer(m[k], d[k])
        c = k + 1
        mu_m = sum_m / c
        mu_d = sum_d / c
        S_mm = sum_mm - c * (mu_m @ mu_m)
        S_dd = sum_dd - c * (mu_d @ mu_d)
        W = sum_W - c * np.outer(mu_m, mu_d)
        U, sig, Vh = np.linalg.svd(W.T)
        sign = np.sign(np.linalg.det(U) * np.linalg.det(Vh)) or 1.0
        tr = sig[0] + sig[1] + sign * sig[2]
        sq = max(S_mm + S_dd - 2.0 * tr, 0.0)
        out[k] = np.sqrt(sq / c) * 100.0
    return out


def matrix_to_tum(ts: float, matrix: np.ndarray) -> list:
    q = Rotation.from_matrix(matrix[:3, :3]).as_quat()
    p = matrix[:3, 3]
    return [ts, p[0], p[1], p[2], q[0], q[1], q[2], q[3]]


def psnr(est: np.ndarray, ref: np.ndarray, mask: np.ndarray | None = None) -> float:
    est = np.asarray(est, np.float64)
    ref = np.asarray(ref, np.float64)
    if mask is not None:
        m = np.broadcast_to(np.asarray(mask, bool), est.shape)
        diff2 = ((est - ref) ** 2)[m]
    else:
        diff2 = (est - ref) ** 2
    mse = float(diff2.mean()) if diff2.size else float("nan")
    if mse <= 0:
        return float("inf")
    return float(10.0 * np.log10(1.0 / mse))


def ssim(est: np.ndarray, ref: np.ndarray) -> float:
    """Single-scale SSIM with an 11x11 Gaussian window (standard constants)."""
    from scipy.ndimage import gaussian_filter

    est = np.asarray(est, np.float64)
    ref = np.asarray(ref, np.float64)
    C1, C2 = 0.01**2, 0.03**2
    sig = 1.5

    def f(x):
        return gaussian_filter(x, sigma=(sig, sig, 0) if x.ndim == 3 else sig)

    mu1, mu2 = f(est), f(ref)
    mu1s, mu2s, mu12 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    s1 = f(est * est) - mu1s
    s2 = f(ref * ref) - mu2s
    s12 = f(est * ref) - mu12
    m = ((2 * mu12 + C1) * (2 * s12 + C2)) / ((mu1s + mu2s + C1) * (s1 + s2 + C2))
    return float(m.mean())


def ms_ssim(est: np.ndarray, ref: np.ndarray, levels: int = 5) -> float:
    """Multi-scale SSIM (Wang et al. 2003) — the reference's published render
    metric (`eval_utils.py:105`, pytorch_msssim). Standard weights; each level
    contributes contrast*structure, the final level adds luminance; scales are
    built by 2x2 average-pool downsampling. Falls back to fewer levels when
    the image is too small for the 11x11 window."""
    from scipy.ndimage import gaussian_filter

    weights = np.asarray([0.0448, 0.2856, 0.3001, 0.2363, 0.1333], np.float64)[:levels]
    C1, C2 = 0.01**2, 0.03**2
    sig = 1.5

    est = np.asarray(est, np.float64)
    ref = np.asarray(ref, np.float64)

    def f(x):
        return gaussian_filter(x, sigma=(sig, sig, 0) if x.ndim == 3 else sig)

    def cs_and_ssim(a, b):
        mu1, mu2 = f(a), f(b)
        mu1s, mu2s, mu12 = mu1 * mu1, mu2 * mu2, mu1 * mu2
        s1 = f(a * a) - mu1s
        s2 = f(b * b) - mu2s
        s12 = f(a * b) - mu12
        cs = (2 * s12 + C2) / (s1 + s2 + C2)
        lum = (2 * mu12 + C1) / (mu1s + mu2s + C1)
        return float(cs.mean()), float((lum * cs).mean())

    def pool(x):
        h, w = x.shape[0] // 2 * 2, x.shape[1] // 2 * 2
        x = x[:h, :w]
        return 0.25 * (x[0::2, 0::2] + x[1::2, 0::2] + x[0::2, 1::2] + x[1::2, 1::2])

    vals = []
    a, b = est, ref
    for li in range(len(weights)):
        if min(a.shape[0], a.shape[1]) < 11:
            break
        cs, ss = cs_and_ssim(a, b)
        vals.append(max(ss if li == len(weights) - 1 else cs, 1e-12))
        if li < len(weights) - 1:
            a, b = pool(a), pool(b)
    if not vals:
        return ssim(est, ref)
    w = weights[: len(vals)] / weights[: len(vals)].sum()
    return float(np.prod(np.asarray(vals) ** w))


def depth_l1(est: np.ndarray, ref: np.ndarray, mask: np.ndarray | None = None) -> float:
    est = np.asarray(est, np.float64).squeeze()
    ref = np.asarray(ref, np.float64).squeeze()
    m = ref > 0 if mask is None else (np.asarray(mask, bool).squeeze() & (ref > 0))
    if not m.any():
        return float("nan")
    return float(np.abs(est - ref)[m].mean())


def eval_render(ref_color, ref_depth, est_color, est_depth) -> dict:
    """PSNR / SSIM / depth-L1 on the depth-valid region (reference
    `eval_render_func` semantics: zero out depth-invalid pixels,
    `eval_utils.py:93-109`)."""
    ref_color = np.asarray(ref_color, np.float64)
    est_color = np.asarray(est_color, np.float64)
    mask = np.asarray(ref_depth).squeeze() > 0
    ec = est_color * mask[..., None]
    rc = ref_color * mask[..., None]
    out = {
        "psnr": psnr(est_color, ref_color, mask[..., None]),
        "ssim": ssim(ec, rc),
        "ms_ssim": ms_ssim(ec, rc),
        "depth_l1": depth_l1(est_depth, ref_depth),
    }
    lp = _lpips(ec, rc)
    # metric values stay strictly numeric-or-None so downstream consumers of
    # render_metrics.json can aggregate without type checks; the availability
    # message (no local AlexNet weights, zero egress to fetch them) rides in
    # a separate note field
    out["lpips"] = lp
    if lp is None:
        out["lpips_note"] = "unavailable (no local AlexNet weights)"
    return out


def unproject_depth(depth: np.ndarray, intr, c2w: np.ndarray,
                    stride: int = 4) -> np.ndarray:
    """Unproject a depth map to world-frame points (numpy, strided).

    `intr` is (fx, fy, cx, cy); invalid (<= 0) depths are dropped.
    """
    d = np.asarray(depth, np.float64).squeeze()[::stride, ::stride]
    fx, fy, cx, cy = [float(x) for x in np.asarray(intr).reshape(-1)[:4]]
    H, W = d.shape
    ys, xs = np.mgrid[0:H, 0:W]
    xs = xs * stride
    ys = ys * stride
    m = d > 0
    z = d[m]
    x = (xs[m] - cx) / fx * z
    y = (ys[m] - cy) / fy * z
    pts = np.stack([x, y, z, np.ones_like(z)], axis=0)
    return (np.asarray(c2w, np.float64) @ pts)[:3].T  # (M, 3)


def eval_recon(map_xyz: np.ndarray, obs_clouds: list, thresh: float = 0.01,
               max_points: int = 200_000, rng=None) -> dict:
    """Reconstruction accuracy/completeness of the fused surfel map.

    The reference ships an `eval_recon` config flag but never consumes it
    (`/root/reference/configs/replica/base.yaml:103` — no call site in its
    src); this wires it, using the standard point-cloud protocol against
    the OBSERVED depth clouds (keyframe depths unprojected at their solved
    poses — no GT mesh is required or shipped by the reference either):

      accuracy      — surfel center -> nearest observed point distance
      completeness  — observed point -> nearest surfel center distance
      f1            — F-score at `thresh` (precision = frac(acc < t),
                      recall = frac(comp < t))
    """
    from scipy.spatial import cKDTree

    rng = rng or np.random.default_rng(0)
    obs = np.concatenate(obs_clouds, axis=0)
    if len(obs) == 0 or len(map_xyz) == 0:
        return {}
    if len(obs) > max_points:
        obs = obs[rng.choice(len(obs), max_points, replace=False)]
    mx = np.asarray(map_xyz, np.float64)
    if len(mx) > max_points:
        mx = mx[rng.choice(len(mx), max_points, replace=False)]
    acc = cKDTree(obs).query(mx, workers=-1)[0]
    comp = cKDTree(mx).query(obs, workers=-1)[0]
    precision = float((acc < thresh).mean())
    recall = float((comp < thresh).mean())
    return {
        "recon_acc_mean": float(acc.mean()),
        "recon_acc_p90": float(np.quantile(acc, 0.9)),
        "recon_comp_mean": float(comp.mean()),
        "recon_comp_p90": float(np.quantile(comp, 0.9)),
        "recon_precision": precision,
        "recon_recall": recall,
        "recon_f1": (
            2 * precision * recall / (precision + recall)
            if precision + recall > 0 else 0.0
        ),
        "recon_thresh_m": thresh,
        "n_map_points": int(len(mx)),
        "n_obs_points": int(len(obs)),
    }


def _lpips(est: np.ndarray, ref: np.ndarray) -> float | None:
    """LPIPS(alex) (reference metric, `eval_utils.py:107`) or None when the
    pretrained weights are unavailable (offline environment)."""
    try:  # pragma: no cover - depends on local torch weights
        import torch
        from torchmetrics.image.lpip import LearnedPerceptualImagePatchSimilarity

        metric = LearnedPerceptualImagePatchSimilarity(net_type="alex", normalize=True)
        e = torch.from_numpy(np.ascontiguousarray(est, np.float32)).permute(2, 0, 1)[None]
        r = torch.from_numpy(np.ascontiguousarray(ref, np.float32)).permute(2, 0, 1)[None]
        return float(metric(e.clamp(0, 1), r.clamp(0, 1)))
    except Exception:
        return None
