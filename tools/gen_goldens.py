"""Generate golden test fixtures by running the REFERENCE implementation
(/root/reference, torch CPU) as a numerical oracle.

This script does not copy reference code — it imports the reference package
read-only, feeds it fixed random inputs, and captures outputs into
tests/golden/*.npz. The test suite then checks our JAX implementation against
these captured tensors with fp32 tolerances (the parity strategy required by
BASELINE.md "API parity" and SURVEY.md §4).

Run from the repo root:  python tools/gen_goldens.py
"""

import sys
from pathlib import Path

import numpy as np
import torch

REF = "/root/reference"
OUT = Path(__file__).resolve().parent.parent / "tests" / "golden"
OUT.mkdir(parents=True, exist_ok=True)

sys.path.insert(0, REF)

torch.manual_seed(0)


def t2n(t):
    return t.detach().cpu().numpy()


def save(name, **arrays):
    np.savez_compressed(OUT / f"{name}.npz", **arrays)
    total = sum(a.nbytes for a in arrays.values())
    print(f"{name}: {len(arrays)} arrays, {total/1e3:.1f} kB")


# ---------------------------------------------------------------- ops.Resample
def gen_resample():
    from models.ops import Resample

    rng = np.random.default_rng(42)
    x = rng.standard_normal((2, 3, 8, 16)).astype(np.float32)
    out = {"x": x}
    cases = [
        ("down2", dict(down=2, ring=True)),
        ("up2", dict(up=2, ring=True)),
        ("down2_noring", dict(down=2, ring=False)),
        ("up2_noring", dict(up=2, ring=False)),
        ("up2_h", dict(up=2, ring=True, direction="h")),
        ("down2_w", dict(down=2, ring=True, direction="w")),
        ("up4", dict(up=4, ring=True)),
        ("down4", dict(down=4, ring=True)),
    ]
    for name, kw in cases:
        mod = Resample(**kw)
        out[name] = t2n(mod(torch.from_numpy(x)))
    save("resample", **out)


# ---------------------------------------------------------------- ops misc
def gen_ops_misc():
    from models.ops import AdaGN, Conv2d, Pad, SinusoidalPositionalEmbedding

    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 6, 8, 16)).astype(np.float32)
    emb = rng.standard_normal((2, 12)).astype(np.float32)
    t = np.array([0.0, 0.25, 1.0, 977.0], dtype=np.float32)

    pad = Pad(2, ring=True)
    conv = Conv2d(6, 10, 3, 1, 1, ring=True)
    adagn = AdaGN(emb_channels=12, out_channels=6, num_groups=3)
    spe = SinusoidalPositionalEmbedding(16)

    save(
        "ops_misc",
        x=x,
        emb=emb,
        t=t,
        pad_out=t2n(pad(torch.from_numpy(x))),
        conv_w=t2n(conv.weight),
        conv_b=t2n(conv.bias),
        conv_out=t2n(conv(torch.from_numpy(x))),
        adagn_w=t2n(adagn.proj[1].weight),
        adagn_b=t2n(adagn.proj[1].bias),
        adagn_out=t2n(adagn(torch.from_numpy(x), torch.from_numpy(emb))),
        spe_out=t2n(spe(torch.from_numpy(t))),
    )


# ---------------------------------------------------------------- encodings
def gen_encodings():
    from models.encoding import (
        FourierFeatures,
        SphericalHarmonics,
        generate_polar_coords,
    )
    from utils.lidar import get_hdl64e_linear_ray_angles

    coords = generate_polar_coords(16, 64)
    sh = SphericalHarmonics(levels=5)
    ff = FourierFeatures((16, 64))
    angles = get_hdl64e_linear_ray_angles(16, 64)
    save(
        "encodings",
        coords=t2n(coords),
        hdl64e=t2n(angles),
        sh_out=t2n(sh(coords)),
        ff_out=t2n(ff(coords)),
        ff_freqs=t2n(ff.freqs),
    )


# ---------------------------------------------------------------- schedules
def gen_schedules():
    from models.diffusion.continuous_time import (
        _log_snr_schedule_cosine,
        _log_snr_schedule_cosine_interpolated,
        _log_snr_schedule_cosine_shifted,
        _log_snr_schedule_linear,
        _log_snr_to_alpha_sigma,
    )
    from models.diffusion.discrete_time import (
        _cosine_beta_schedule,
        _linear_beta_schedule,
        _sigmoid_beta_schedule,
    )

    t = torch.linspace(0, 1, 257, dtype=torch.float32)
    lin = _log_snr_schedule_linear(t)[:, 0, 0, 0]
    cos = _log_snr_schedule_cosine(t)[:, 0, 0, 0]
    cos_sh = _log_snr_schedule_cosine_shifted(t, image_d=64, noise_d=32)[:, 0, 0, 0]
    cos_in = _log_snr_schedule_cosine_interpolated(
        t, image_d=64, noise_d_low=32, noise_d_high=128
    )[:, 0, 0, 0]
    alpha, sigma = _log_snr_to_alpha_sigma(cos)
    save(
        "schedules",
        t=t2n(t),
        logsnr_linear=t2n(lin),
        logsnr_cosine=t2n(cos),
        logsnr_cosine_shifted=t2n(cos_sh),
        logsnr_cosine_interpolated=t2n(cos_in),
        alpha=t2n(alpha),
        sigma=t2n(sigma),
        beta_linear=t2n(_linear_beta_schedule(1000).float()),
        beta_cosine=t2n(_cosine_beta_schedule(1000).float()),
        beta_sigmoid=t2n(_sigmoid_beta_schedule(1000).float()),
    )


# ---------------------------------------------------------------- lidar utils
def gen_lidar():
    from utils.lidar import LiDARUtility

    rng = np.random.default_rng(3)
    metric = (rng.uniform(0, 85, (2, 1, 16, 64))).astype(np.float32)
    out = {"metric": metric}
    for fmt in ["log_depth", "inverse_depth", "depth"]:
        util = LiDARUtility((16, 64), fmt, 1.45, 80.0)
        m = torch.from_numpy(metric)
        converted = util.convert_depth(m)
        out[f"{fmt}_converted"] = t2n(converted)
        out[f"{fmt}_reverted"] = t2n(util.revert_depth(converted))
        if fmt == "log_depth":
            out["xyz"] = t2n(util.to_xyz(m))
            out["ray_angles"] = t2n(util.ray_angles)
            out["mask"] = t2n(util.get_mask(m))
    save("lidar", **out)


# ---------------------------------------------------------------- tiny U-Net
TINY = dict(
    in_channels=2,
    resolution=(16, 64),
    base_channels=16,
    temb_channels=None,
    channel_multiplier=(1, 2, 4, 8),
    num_residual_blocks=(1, 1, 1, 1),
    gn_num_groups=4,
    gn_eps=1e-6,
    attn_num_heads=4,
    ring=True,
)


def _randomize(model):
    """Re-init all parameters AND buffers randomly (but reproducibly) so
    zero-initialized layers also get exercised."""
    g = torch.Generator().manual_seed(1234)
    param_names = {n for n, _ in model.named_parameters()}
    sd = model.state_dict()
    for k, v in sd.items():
        # only true parameters: buffers (coords, FIR kernels, fourier freqs,
        # residual scales) are deterministic constants we recompute
        if k in param_names and v.dtype.is_floating_point:
            sd[k] = torch.randn(v.shape, generator=g) * 0.05
    model.load_state_dict(sd)
    return model


def gen_tiny_unet():
    from models.efficient_unet import EfficientUNet

    for cenc in ["fourier_features", "spherical_harmonics", "polar_coordinates"]:
        net = EfficientUNet(coords_encoding=cenc, **TINY)
        net = _randomize(net)
        net.eval()
        rng = np.random.default_rng(7)
        x = rng.standard_normal((2, 2, 16, 64)).astype(np.float32)
        t = np.array([-3.7, 11.2], dtype=np.float32)  # logSNR-style conditions
        with torch.no_grad():
            y = net(torch.from_numpy(x), torch.from_numpy(t))
        sd = {k: t2n(v) for k, v in net.state_dict().items()}
        save(
            f"tiny_unet_{cenc}",
            x=x,
            t=t,
            y=t2n(y),
            **{f"sd::{k}": v for k, v in sd.items()},
        )


# ---------------------------------------------------------------- tiny diffusion
def gen_tiny_diffusion():
    from models.diffusion import (
        ContinuousTimeGaussianDiffusion,
        DiscreteTimeGaussianDiffusion,
    )
    from models.efficient_unet import EfficientUNet

    net = EfficientUNet(coords_encoding="fourier_features", **TINY)
    net = _randomize(net)
    ddpm = ContinuousTimeGaussianDiffusion(
        model=net, prediction_type="eps", noise_schedule="cosine"
    )
    ddpm.eval()
    rng = np.random.default_rng(11)
    x_t = rng.standard_normal((2, 2, 16, 64)).astype(np.float32)
    step_t = np.array([0.8, 0.5], dtype=np.float32)
    step_s = np.array([0.7, 0.4], dtype=np.float32)
    # p_step with deterministic noise: monkeypatch randn_like to zeros to make
    # the DDPM mean capturable, plus DDIM (eta=0, deterministic anyway)
    ddpm.randn_like = lambda x, rng=None: torch.zeros_like(x)
    with torch.no_grad():
        ddpm_mean = ddpm.p_step(
            torch.from_numpy(x_t),
            torch.from_numpy(step_t),
            torch.from_numpy(step_s),
            mode="ddpm",
        )
        ddim_out = ddpm.p_step(
            torch.from_numpy(x_t),
            torch.from_numpy(step_t),
            torch.from_numpy(step_s),
            mode="ddim",
        )
    # loss with fixed noise: patch randn_like used by q_step_from_x_0
    noise = rng.standard_normal((2, 2, 16, 64)).astype(np.float32)
    ddpm.randn_like = lambda x, rng=None: torch.from_numpy(noise).to(x)
    with torch.no_grad():
        loss = ddpm.p_loss(torch.from_numpy(x_t), torch.from_numpy(step_t))
        # per-sample pieces for the intended (per-sample) min-SNR weighting:
        # the reference's own p_loss broadcasts (B,1)x(B,1,1,1) -> (B,1,B,1),
        # i.e. mean(loss)*mean(weight); we capture the parts so the JAX test
        # can check mean(per*weight) directly.
        xt_det, n_det = ddpm.q_step_from_x_0(
            torch.from_numpy(x_t), torch.from_numpy(step_t)
        )
        pred = net(xt_det, ddpm.get_network_condition(torch.from_numpy(step_t)))
        per_sample = ((pred - n_det) ** 2).mean(dim=(1, 2, 3))
        weight = ddpm.get_loss_weight(torch.from_numpy(step_t))[:, 0, 0, 0]
    sd = {k: t2n(v) for k, v in net.state_dict().items()}
    save(
        "tiny_diffusion_continuous",
        x_t=x_t,
        step_t=step_t,
        step_s=step_s,
        ddpm_mean=t2n(ddpm_mean),
        ddim_out=t2n(ddim_out),
        noise=noise,
        loss=np.array(float(loss)),
        per_sample=t2n(per_sample),
        loss_weight=t2n(weight),
        **{f"sd::{k}": v for k, v in sd.items()},
    )

    ddpm_d = DiscreteTimeGaussianDiffusion(
        model=net,
        prediction_type="eps",
        noise_schedule="cosine",
        num_training_steps=64,
    )
    ddpm_d.eval()
    steps = np.array([5, 33], dtype=np.int64)
    ddpm_d.randn_like = lambda x, rng=None: torch.zeros_like(x)
    with torch.no_grad():
        d_ddpm_mean = ddpm_d.p_step(
            torch.from_numpy(x_t), torch.from_numpy(steps), mode="ddpm"
        )
        d_ddim = ddpm_d.p_step(
            torch.from_numpy(x_t), torch.from_numpy(steps), mode="ddim"
        )
    ddpm_d.randn_like = lambda x, rng=None: torch.from_numpy(noise).to(x)
    with torch.no_grad():
        d_loss = ddpm_d.p_loss(torch.from_numpy(x_t), torch.from_numpy(steps))
        xt_det, n_det = ddpm_d.q_step_from_x_0(
            torch.from_numpy(x_t), torch.from_numpy(steps)
        )
        pred = net(xt_det, torch.from_numpy(steps))
        d_per_sample = ((pred - n_det) ** 2).mean(dim=(1, 2, 3))
        d_weight = ddpm_d.get_loss_weight(torch.from_numpy(steps))[:, 0, 0, 0]
    save(
        "tiny_diffusion_discrete",
        x_t=x_t,
        steps=steps,
        ddpm_mean=t2n(d_ddpm_mean),
        ddim_out=t2n(d_ddim),
        noise=noise,
        loss=np.array(float(d_loss)),
        per_sample=t2n(d_per_sample),
        loss_weight=t2n(d_weight),
    )


# ---------------------------------------------------------------- refinenet
def gen_tiny_refinenet():
    from models.refinenet import LiDARGenRefineNet

    net = LiDARGenRefineNet(
        in_channels=2, resolution=(16, 64), base_channels=8,
        channel_multiplier=(1, 2, 2, 2),
    )
    net = _randomize(net)
    net.eval()
    rng = np.random.default_rng(13)
    x = rng.standard_normal((2, 2, 16, 64)).astype(np.float32)
    with torch.no_grad():
        y = net(torch.from_numpy(x), None)
    sd = {k: t2n(v) for k, v in net.state_dict().items()}
    save(
        "tiny_refinenet",
        x=x,
        y=t2n(y),
        **{f"sd::{k}": v for k, v in sd.items()},
    )


# ---------------------------------------------------------------- render
def _fake_kornia():
    """kornia is not installed; the reference uses only two small geometry
    helpers, reproduced here in torch for the golden oracle."""
    import types

    mod = types.ModuleType("kornia")
    geometry = types.ModuleType("kornia.geometry")
    conversions = types.ModuleType("kornia.geometry.conversions")

    def axis_angle_to_rotation_matrix(v):
        # Rodrigues: R = I + sin(t) K + (1 - cos(t)) K^2
        theta = torch.norm(v, dim=-1, keepdim=True).clamp(min=1e-12)
        axis = v / theta
        t = theta[..., None]
        kx, ky, kz = axis[..., 0], axis[..., 1], axis[..., 2]
        zero = torch.zeros_like(kx)
        K = torch.stack(
            [
                torch.stack([zero, -kz, ky], -1),
                torch.stack([kz, zero, -kx], -1),
                torch.stack([-ky, kx, zero], -1),
            ],
            -2,
        )
        eye = torch.eye(3).expand(K.shape)
        return eye + torch.sin(t) * K + (1 - torch.cos(t)) * (K @ K)

    def project_points(points, K):
        # perspective divide then intrinsics (kornia semantics)
        xy = points[..., :2] / points[..., 2:3]
        ones = torch.ones_like(xy[..., :1])
        uvw = torch.cat([xy, ones], dim=-1) @ K.transpose(-1, -2)
        return uvw[..., :2]

    conversions.axis_angle_to_rotation_matrix = axis_angle_to_rotation_matrix
    geometry.conversions = conversions
    geometry.project_points = project_points
    mod.geometry = geometry
    sys.modules.setdefault("kornia", mod)
    sys.modules.setdefault("kornia.geometry", geometry)
    sys.modules.setdefault("kornia.geometry.conversions", conversions)


def gen_render():
    _fake_kornia()
    from utils.render import (
        bilinear_rasterizer,
        colorize,
        estimate_surface_normal,
        make_Rt,
        render_point_clouds,
    )

    rng = np.random.default_rng(17)
    # rasterizer
    coords = torch.from_numpy(
        rng.uniform(-2, 34, (2, 500, 2)).astype(np.float32)
    )
    values = torch.from_numpy(rng.standard_normal((2, 500, 3)).astype(np.float32))
    rast = bilinear_rasterizer(coords, values, (32, 32))
    # normals from a smooth surface
    h = np.linspace(-1, 1, 16)
    w = np.linspace(-np.pi, np.pi, 64, endpoint=False)
    hh, ww = np.meshgrid(h, w, indexing="ij")
    r = 5 + np.sin(3 * ww) + 0.5 * hh
    pts = np.stack(
        [r * np.cos(ww), r * np.sin(ww), hh * 2], axis=0
    ).astype(np.float32)[None]
    pts = np.repeat(pts, 2, axis=0)
    pts[1] += 0.1
    normals = estimate_surface_normal(torch.from_numpy(pts), d=2, mode="closest")
    normals_mean = estimate_surface_normal(torch.from_numpy(pts), d=1, mode="mean")
    # full BEV render
    points_flat = torch.from_numpy(
        pts.reshape(2, 3, -1).transpose(0, 2, 1) / 10.0
    )
    colors = torch.from_numpy(
        rng.uniform(0, 1, points_flat.shape).astype(np.float32)
    )
    R, t = make_Rt(pitch=np.pi / 4, yaw=np.pi / 8, z=0.8)
    bev = render_point_clouds(points_flat, colors, size=64, R=R, t=t)
    # colorize
    scalar = torch.from_numpy(rng.uniform(-0.1, 1.1, (2, 16, 64)).astype(np.float32))
    save(
        "render",
        coords=t2n(coords),
        values=t2n(values),
        rast=t2n(rast),
        pts=pts,
        normals=t2n(normals),
        normals_mean=t2n(normals_mean),
        points_flat=t2n(points_flat),
        colors=t2n(colors),
        R=t2n(R),
        t_vec=t2n(t),
        bev=t2n(bev),
        scalar=t2n(scalar),
        colorized=t2n(colorize(scalar)),
    )


# ---------------------------------------------------------------- projection
def _fake_numba():
    """numba is not installed here; the reference only uses @numba.jit as a
    passthrough decorator on a tiny scatter loop."""
    import types

    mod = types.ModuleType("numba")

    def jit(*a, **k):
        def deco(fn):
            return fn

        return deco

    mod.jit = jit
    sys.modules.setdefault("numba", mod)


def gen_projection():
    _fake_numba()
    from data.kitti_360.kitti_360 import load_points_as_images

    rng = np.random.default_rng(21)
    n = 40_000
    azimuth = rng.uniform(-np.pi, np.pi, n)
    r = rng.uniform(0.5, 90.0, n)  # includes out-of-gate depths
    x = r * np.cos(azimuth)
    y = r * np.sin(azimuth)
    z = rng.uniform(-4.0, 2.0, n)
    refl = rng.uniform(0, 1, n)
    points = np.stack([x, y, z, refl], axis=1).astype(np.float32)
    bin_path = OUT / "_tmp_scan.bin"
    points.tofile(bin_path)

    out = {"points": points}
    out["spherical"] = load_points_as_images(
        str(bin_path), scan_unfolding=False, H=64, W=256
    )
    # unfolding needs ring-ordered points: emit points ring-by-ring in
    # counterclockwise azimuth order like a spinning scanner
    rings = 16
    per = 512
    az = np.tile(np.linspace(-np.pi + 1e-3, np.pi - 1e-3, per), rings)
    elev = np.repeat(np.deg2rad(np.linspace(2.5, -24.5, rings)), per)
    rr = rng.uniform(2.0, 70.0, rings * per)
    pts2 = np.stack(
        [
            rr * np.cos(elev) * np.cos(-az),
            rr * np.cos(elev) * np.sin(-az),
            rr * np.sin(elev),
            rng.uniform(0, 1, rings * per),
        ],
        axis=1,
    ).astype(np.float32)
    bin2 = OUT / "_tmp_scan2.bin"
    pts2.tofile(bin2)
    out["points_unfold"] = pts2
    out["unfolding"] = load_points_as_images(
        str(bin2), scan_unfolding=True, H=16, W=256
    )
    bin_path.unlink()
    bin2.unlink()
    save("projection", **out)


def gen_split_tables():
    _fake_numba()
    import data.kitti_raw.kitti_raw as kr
    from data.kitti_360.kitti_360 import _SEQUENCE_SPLITS as k360

    test_drives = []
    for category in ["city", "road", "residential"]:
        for seq_name in kr._RAW_RECORDS[category]:
            if seq_name not in kr._RAW_TRAINVAL:
                test_drives.append(seq_name)
    odo = {
        k: (v[0], v[1], v[2]) for k, v in kr._ODOMETRY_TO_RAW.items()
    }
    np.savez_compressed(
        OUT / "splits.npz",
        kitti360_train=np.array(sorted(k360["lidargen"]["train"])),
        kitti360_test=np.array(sorted(k360["lidargen"]["test"])),
        raw_test_drives=np.array(test_drives),
        odometry_keys=np.array(sorted(odo.keys())),
        odometry_values=np.array(
            [str(odo[k]) for k in sorted(odo.keys())]
        ),
    )
    print("splits: saved")


# ---------------------------------------------------------------- metrics
def _fake_torchvision():
    """torchvision is not installed; the reference only uses
    transforms.Normalize (channelwise standardization)."""
    import types

    mod = types.ModuleType("torchvision")
    transforms = types.ModuleType("torchvision.transforms")

    class Normalize:
        def __init__(self, mean, std):
            self.mean = torch.tensor(mean).view(1, -1, 1, 1)
            self.std = torch.tensor(std).view(1, -1, 1, 1)

        def __call__(self, x):
            return (x - self.mean.to(x)) / self.std.to(x)

    transforms.Normalize = Normalize
    mod.transforms = transforms
    sys.modules.setdefault("torchvision", mod)
    sys.modules.setdefault("torchvision.transforms", transforms)


def gen_metrics_bev_dist():
    from metrics.bev import compute_jsd_2d, compute_mmd_2d, point_cloud_to_histogram
    from metrics.distribution import compute_frechet_distance, compute_squared_mmd

    rng = np.random.default_rng(31)
    pts = rng.uniform(-90, 90, (5000, 3)).astype(np.float32)
    hist = point_cloud_to_histogram(torch.from_numpy(pts))
    hists1 = torch.stack(
        [
            point_cloud_to_histogram(
                torch.from_numpy(rng.uniform(-80, 80, (3000, 3)).astype(np.float32))
            )
            for _ in range(4)
        ]
    )
    hists2 = torch.stack(
        [
            point_cloud_to_histogram(
                torch.from_numpy(
                    rng.normal(0, 30, (3000, 3)).astype(np.float32)
                )
            )
            for _ in range(4)
        ]
    )
    jsd = compute_jsd_2d(hists1, hists2)
    mmd = compute_mmd_2d(hists1, hists2)

    feats1 = rng.standard_normal((64, 32)).astype(np.float64)
    feats2 = (rng.standard_normal((64, 32)) * 1.3 + 0.2).astype(np.float64)
    fd = compute_frechet_distance(feats1, feats2)
    np.random.seed(123)
    smmd = compute_squared_mmd(feats1, feats2, num_subsets=10, max_subset_size=32)
    save(
        "metrics_basic",
        pts=pts,
        hist=t2n(hist),
        hists1=t2n(hists1),
        hists2=t2n(hists2),
        jsd=np.array(jsd),
        mmd=np.array(mmd),
        feats1=feats1,
        feats2=feats2,
        fd=np.array(fd),
        smmd_seed123=np.array(smmd),
    )


def gen_pointnet():
    from metrics.extractor.pointnet import PointNet1

    net = PointNet1(k=16)
    # randomize incl. BN running stats (var must stay positive)
    g = torch.Generator().manual_seed(99)
    sd = net.state_dict()
    for k, v in sd.items():
        if k.endswith("num_batches_tracked"):
            continue
        if k.endswith("running_var"):
            sd[k] = torch.rand(v.shape, generator=g) + 0.5
        else:
            sd[k] = torch.randn(v.shape, generator=g) * 0.1
    net.load_state_dict(sd)
    net.eval()
    rng = np.random.default_rng(41)
    pts = rng.standard_normal((2, 3, 512)).astype(np.float32)
    with torch.no_grad():
        feats = net(torch.from_numpy(pts))
    save(
        "pointnet",
        pts=pts,
        feats=t2n(feats),
        **{
            f"sd::{k}": t2n(v).astype(np.float16)
            for k, v in net.state_dict().items()
            if not k.endswith("num_batches_tracked")
        },
    )


def gen_rangenet_blocks():
    _fake_torchvision()
    from metrics.extractor.rangenet import Block, ConvNormLReLU, Preprocess

    g = torch.Generator().manual_seed(7)

    def randomize(mod):
        sd = mod.state_dict()
        for k, v in sd.items():
            if k.endswith("num_batches_tracked"):
                continue
            if k.endswith("running_var"):
                sd[k] = torch.rand(v.shape, generator=g) + 0.5
            else:
                sd[k] = torch.randn(v.shape, generator=g) * 0.1
        mod.load_state_dict(sd)
        mod.eval()
        return mod

    rng = np.random.default_rng(43)
    x = rng.standard_normal((2, 8, 4, 64)).astype(np.float32)

    stem = randomize(ConvNormLReLU(8, 16, 3, 1, 1, 0.01))
    down = randomize(Block(8, 16, 2, 0.01, "down"))
    up = randomize(Block(8, 4, 1, 0.01, "up"))
    out = {}
    with torch.no_grad():
        out["stem_out"] = t2n(stem(torch.from_numpy(x)))
        out["down_out"] = t2n(down(torch.from_numpy(x)))
        out["up_out"] = t2n(up(torch.from_numpy(x)))
    pre = Preprocess()
    img = rng.uniform(0, 30, (2, 5, 4, 64)).astype(np.float32)
    img[:, 0] *= (rng.uniform(0, 1, (2, 4, 64)) > 0.3)
    with torch.no_grad():
        out["pre_in"] = img
        out["pre_out"] = t2n(pre(torch.from_numpy(img)))
    sds = {}
    for name, mod in (("stem", stem), ("down", down), ("up", up)):
        for k, v in mod.state_dict().items():
            if not k.endswith("num_batches_tracked"):
                sds[f"sd_{name}::{k}"] = t2n(v)
    save("rangenet_blocks", x=x, **out, **sds)


def gen_postprocessors():
    _fake_torchvision()
    from metrics.extractor.rangenet import CRFRNN, kNN

    rng = np.random.default_rng(47)
    B, H, W, N = 2, 8, 32, 6
    depth = rng.uniform(0, 50, (B, 1, H, W)).astype(np.float32)
    depth[rng.uniform(0, 1, depth.shape) < 0.2] = -1.0  # invalid
    label = rng.integers(0, N, (B, H, W))
    knn_mod = kNN(num_classes=N)
    with torch.no_grad():
        refined = knn_mod(torch.from_numpy(depth), torch.from_numpy(label))

    unary = rng.standard_normal((B, N, H, W)).astype(np.float32)
    xyz = rng.standard_normal((B, 3, H, W)).astype(np.float32)
    mask = (rng.uniform(0, 1, (B, H, W)) > 0.2).astype(np.float32)
    crf = CRFRNN(num_classes=N)
    crf.eval()
    with torch.no_grad():
        crf_out = crf(
            torch.from_numpy(unary), torch.from_numpy(xyz), torch.from_numpy(mask)
        )
    save(
        "postprocessors",
        depth=depth,
        label=label.astype(np.int64),
        knn_refined=t2n(refined),
        unary=unary,
        xyz=xyz,
        mask=mask,
        crf_out=t2n(crf_out),
        crf_weight_appearance=t2n(crf.weight_appearance),
        crf_weight_smoothness=t2n(crf.weight_smoothness),
        crf_compat=t2n(crf.label_compatibility.weight),
    )


if __name__ == "__main__":
    gen_resample()
    gen_ops_misc()
    gen_encodings()
    gen_schedules()
    gen_lidar()
    gen_tiny_unet()
    gen_tiny_diffusion()
    gen_tiny_refinenet()
    gen_projection()
    gen_split_tables()
    gen_render()
    gen_metrics_bev_dist()
    gen_pointnet()
    gen_rangenet_blocks()
    gen_postprocessors()
    print("done ->", OUT)
