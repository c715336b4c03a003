"""Golden-image gates (VERDICT r1 item 2).

Two layers of defense:

1. **Regression**: re-render each stage's small test config and compare to
   the committed artifact in ``goldens/test/`` — catches any semantic drift
   in integrators/scenes/tonemapping.
2. **Reference match**: compare the committed artifacts *statistically*
   against the reference's own published screenshots
   (``/root/reference/Sample Images/``, ``README.md:79-107``).  Screenshots
   are full-app JPEG captures, so content is located via
   ``utils.refcompare`` crops and compared as per-region mean colors.
   Fixed-pose stages (MC Cornell at the default Cornell camera, Denoiser)
   get tight gates; free-flown screenshots (Whitted, NPPT, bunny/teapot)
   get loose structural/palette gates — the pose in those captures is not
   the default camera (verified: the default-pose framing differs, e.g.
   WhittedStyle.jpg's glass sphere subtends ~60% of frame height vs 36% at
   Camera.h's (0,0,6) pose).

Tolerances were calibrated empirically (see PROGRESS r2): MC 8x8 grid mean
abs diff measured 0.018 vs the RR0.8 300spp capture; gates are ~2x the
measured value.
"""

import os

import numpy as np
import pytest

from cpu_based_ray_tracer_tpu.utils import image as im
from cpu_based_ray_tracer_tpu.utils import refcompare as rc

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
GOLD = os.path.join(ROOT, "goldens", "test")

_have_pil = True
try:  # reference comparison needs a JPEG decoder
    import PIL  # noqa: F401
except ImportError:  # pragma: no cover
    _have_pil = False


def _gold(name) -> np.ndarray:
    p = os.path.join(GOLD, name + ".png")
    if not os.path.isfile(p):
        pytest.skip(f"golden {name} not generated")
    return im.read_png(p)


def _ref(rel):
    if not _have_pil:
        pytest.skip("PIL unavailable")
    p = rc.sample_image_path(rel)
    if p is None:
        pytest.skip(f"reference sample image unavailable: {rel}")
    return rc.load_rgb(p)


def assert_close_u8(a: np.ndarray, b: np.ndarray, mean_tol=1.5, p99_tol=8):
    """u8 image closeness: mean abs diff and 99th-percentile abs diff (a
    stray firefly pixel may differ by a lot; the image must not)."""
    assert a.shape == b.shape
    d = np.abs(a.astype(np.int32) - b.astype(np.int32))
    assert d.mean() <= mean_tol, f"mean abs diff {d.mean():.2f} > {mean_tol}"
    p99 = np.percentile(d, 99)
    assert p99 <= p99_tol, f"p99 abs diff {p99:.1f} > {p99_tol}"


# --------------------------------------------------------------------------
# 1. Regression: current code reproduces the committed goldens.
# --------------------------------------------------------------------------

def test_regen_offline():
    from tools import make_goldens as mg

    u8, _ = mg.offline_rtiow(200, 112, 16)
    assert_close_u8(u8, _gold("offline_rtiow"))
    # And the PPM twin decodes to the same pixels as the PNG.
    ppm = im.read_ppm(os.path.join(GOLD, "offline_rtiow.ppm"))
    np.testing.assert_array_equal(ppm, _gold("offline_rtiow"))


def test_regen_nppt():
    from tools import make_goldens as mg

    u8, _ = mg.nppt(128, 128, 16)
    assert_close_u8(u8, _gold("nppt"))


def test_regen_whitted():
    from tools import make_goldens as mg

    u8, _ = mg.whitted(128, 128)
    assert_close_u8(u8, _gold("whitted"), mean_tol=1.0, p99_tol=4)


def test_regen_mesh():
    from tools import make_goldens as mg

    u8, meta = mg.bunny_teapot(160, 96)
    if meta.get("tris") is None:
        pytest.skip("reference OBJ assets unavailable")
    assert_close_u8(u8, _gold("bunny_teapot"), mean_tol=1.0, p99_tol=4)


def test_regen_mc_cornell():
    from tools import make_goldens as mg

    u8, _ = mg.mc_cornell(128, 128, 64, 0.8, chunk_spp=64)
    assert_close_u8(u8, _gold("mc_cornell"), mean_tol=2.0, p99_tol=16)


def test_regen_denoiser():
    from tools import make_goldens as mg

    out = mg.denoiser_triple(128, 128, n_frames=4)
    for name, (u8, _) in out.items():
        assert_close_u8(u8, _gold(name), mean_tol=2.0, p99_tol=16)


# --------------------------------------------------------------------------
# 2. Reference match: committed goldens vs the reference's Sample Images.
# --------------------------------------------------------------------------

def _mc_crop_ours(name="mc_cornell"):
    return rc.cornell_box_crop(_gold(name).astype(np.float32) / 255.0,
                               pool=4)


@pytest.mark.parametrize("sample,gate,max_gate", [
    ("RR0.8 300spp.jpg", 0.035, 0.15),
    # The 3000spp capture is a slightly different window/zoom (measured
    # mean 0.038 / max 0.18, vs 0.018/0.09 for the 300spp one; the max cell
    # is the ceiling-light cell shifting with crop alignment).
    ("Diffuse Cornell Box with 53 mins temporal accumulation "
     "(3000spp).jpg", 0.05, 0.2),
])
def test_mc_cornell_matches_reference(sample, gate, max_gate):
    """The BASELINE forward-correctness gate: our Cornell render's box,
    cropped & gridded, matches the reference's long-accumulation captures
    cell by cell (measured 0.018 mean vs the 300spp capture)."""
    ref = _ref(f"monte carlo path tracer/{sample}")
    ca = rc.cornell_box_crop(ref, pool=16)
    cb = _mc_crop_ours()
    mean_d, max_d = rc.grid_diff(ca, cb, 8)
    assert mean_d < gate, f"8x8 grid mean diff {mean_d:.4f}"
    assert max_d < max_gate, f"8x8 grid max diff {max_d:.4f}"


def test_denoiser_noisy_matches_reference():
    ref = _ref("denoiser/without denoising.jpg")
    ca = rc.cornell_box_crop(ref, pool=16)
    cb = rc.cornell_box_crop(
        _gold("denoiser_noisy_1spp").astype(np.float32) / 255.0, pool=4)
    mean_d, _ = rc.grid_diff(ca, cb, 6)
    assert mean_d < 0.05, f"noisy 6x6 grid mean diff {mean_d:.4f}"


def test_denoiser_denoised_matches_reference():
    # Looser: the capture's JBF kernel/temporal weighting settings are not
    # recorded; what must match is the denoised box's per-region color.
    ref = _ref("denoiser/with denoising.jpg")
    ca = rc.cornell_box_crop(ref, pool=16)
    cb = rc.cornell_box_crop(
        _gold("denoiser_denoised").astype(np.float32) / 255.0, pool=4)
    mean_d, _ = rc.grid_diff(ca, cb, 6)
    assert mean_d < 0.08, f"denoised 6x6 grid mean diff {mean_d:.4f}"


def test_denoiser_variance_reduction_like_reference():
    """The with/without pair must show the same qualitative effect as the
    reference's pair: denoising slashes local pixel variance."""
    def local_var(img):
        f = img.astype(np.float32) / 255.0
        mu = rc.box_filter(f, 4)
        mu2 = rc.box_filter(f * f, 4)
        return float(np.mean(mu2 - mu * mu))

    noisy, den = _gold("denoiser_noisy_1spp"), _gold("denoiser_denoised")
    ours_ratio = local_var(den) / max(local_var(noisy), 1e-12)
    assert ours_ratio < 0.35, f"denoise variance ratio {ours_ratio:.3f}"

    ref_n = _ref("denoiser/without denoising.jpg")
    ref_d = _ref("denoiser/with denoising.jpg")
    rn = rc.cornell_box_crop(ref_n, pool=16)
    rd = rc.cornell_box_crop(ref_d, pool=16)
    ref_ratio = (float(np.mean(rc.box_filter(rd * rd, 4)
                               - rc.box_filter(rd, 4) ** 2))
                 / max(float(np.mean(rc.box_filter(rn * rn, 4)
                                     - rc.box_filter(rn, 4) ** 2)), 1e-12))
    assert ref_ratio < 0.35  # same direction & magnitude class


def test_mesh_palette_matches_reference():
    """Free-flown captures: compare sky color and object grey level only
    (``stanford_bunny.jpg`` / ``utah_teapot.jpg`` are zoomed-in poses)."""
    sky_ref = (0.2, 0.7, 0.8)
    ours = _gold("bunny_teapot").astype(np.float32) / 255.0
    sky_o, obj_o, frac = rc.sky_and_object_stats(ours, sky_ref)
    np.testing.assert_allclose(sky_o, sky_ref, atol=0.02)
    # Grey level is view-dependent (Blinn-Phong sums radiance * |cos| over
    # visible normals; the captures are zoomed-in flown poses showing more
    # lit top surface — teapot capture measures 0.32, bunny 0.23, our
    # default-pose render 0.21), so the grey gate is loose; the strong
    # invariants are achromaticity and the sky color.
    for name, tol in (("utah_teapot", 0.12), ("stanford_bunny", 0.12)):
        ref = _ref(f"bvh ray tracer/{name}.jpg")
        vb = rc.color_region_bbox(ref, sky_ref, tol=0.22, pool=8)
        crop = ref[vb[0]:ref.shape[0], vb[2]:vb[3]]
        sky_r, obj_r, _ = rc.sky_and_object_stats(crop, sky_ref)
        np.testing.assert_allclose(sky_o, sky_r, atol=0.06)
        # Same grey Whitted material, same lights: mean grey level agrees.
        assert abs(obj_o.mean() - obj_r.mean()) < tol, (obj_o, obj_r)
        # And the object is achromatic in both (max channel spread small).
        assert np.ptp(obj_r) < 0.02 and np.ptp(obj_o) < 0.02


def test_whitted_structure_matches_reference():
    """Loose gate (free-flown pose): same sky, same orange/yellow board
    palette, same overall 4x4 structure within 0.15."""
    ref = _ref("whitted style ray tracer/WhittedStyle.jpg")
    ours = _gold("whitted").astype(np.float32) / 255.0
    vb = rc.color_region_bbox(ref, (0.2, 0.7, 0.8), tol=0.22, pool=8,
                              frac=0.1)
    vp = ref[vb[0]:ref.shape[0] - 4, vb[2]:vb[3]]
    h, w = vp.shape[:2]
    a = ours.shape[1] / ours.shape[0]
    w2 = int(h * a)
    vpc = vp[:, (w - w2) // 2:(w - w2) // 2 + w2]
    mean_d, _ = rc.grid_diff(vpc, ours, 4)
    assert mean_d < 0.15, f"whitted 4x4 grid mean diff {mean_d:.4f}"
    # Board palette: in both, the lower half contains warm (red > blue)
    # chessboard pixels whose mean color agrees (orange/yellow mix,
    # TriangleMesh.h:79-86 lerp of (0.815,0.235,0.031)/(0.937,0.937,0.231)).
    means = []
    for img in (vpc, ours):
        lower = img[img.shape[0] // 2:]
        mask = lower[..., 0] > lower[..., 2] + 0.05
        assert mask.mean() > 0.02, "no warm board pixels found"
        means.append(lower[mask].mean(0))
    np.testing.assert_allclose(means[0], means[1], atol=0.15)


def test_nppt_structure_matches_reference():
    """Loose gate (slightly flown pose): 6x6 grid within 0.12; the
    glass/red-metal/blue/gold palette present in both."""
    ref = _ref("non physical path tracer/non-physical path tracing.png")
    ours = _gold("nppt").astype(np.float32) / 255.0
    h, w = ref.shape[:2]
    a = ours.shape[1] / ours.shape[0]
    w2 = int(h * a)
    refc = ref[:, (w - w2) // 2:(w - w2) // 2 + w2]
    mean_d, _ = rc.grid_diff(refc, ours, 6)
    assert mean_d < 0.12, f"nppt 6x6 grid mean diff {mean_d:.4f}"


# --------------------------------------------------------------------------
# 3. Converged showcase anchor: the committed 883x900 / >=1024-SPP artifact
#    (rendered on-chip by the fused engine, goldens/showcase/MANIFEST.json)
#    vs the reference's own converged captures.  Tighter than the test-tier
#    gates above: at 1024+ SPP both sides are noise-free, so a 12x12 grid of
#    mean crop colors must agree closely (measured r3: mean 0.017 / max
#    0.081 vs RR0.8 10000spp.jpg; gates ~1.7x measured).
# --------------------------------------------------------------------------

SHOW = os.path.join(ROOT, "goldens", "showcase")


def _show(name) -> np.ndarray:
    p = os.path.join(SHOW, name + ".png")
    if not os.path.isfile(p):
        pytest.skip(f"showcase artifact {name} not generated")
    return im.read_png(p)


@pytest.mark.parametrize("sample,gate,max_gate", [
    ("RR0.8 10000spp.jpg", 0.03, 0.12),
    ("RR0.8 300spp.jpg", 0.03, 0.12),
])
def test_mc_1024spp_showcase_matches_reference(sample, gate, max_gate):
    ref = _ref(f"monte carlo path tracer/{sample}")
    ca = rc.cornell_box_crop(ref, pool=16)
    cb = rc.cornell_box_crop(
        _show("mc_cornell_1024spp").astype(np.float32) / 255.0, pool=8)
    mean_d, max_d = rc.grid_diff(ca, cb, 12)
    assert mean_d < gate, f"12x12 grid mean diff {mean_d:.4f}"
    assert max_d < max_gate, f"12x12 grid max diff {max_d:.4f}"


def test_rr_ablation_showcase_consistent():
    """RR in {0.5, 0.8, 0.9} at 300 SPP: unbiasedness means the MEAN image
    must not shift with the survival probability (the reference's own
    ablation set, Sample Images RR*.jpg); only the noise level may."""
    imgs = {rr: _show(f"mc_cornell_rr{rr}_300spp").astype(np.float32) / 255.0
            for rr in (50, 80, 90)}
    base = rc.cornell_box_crop(imgs[80], pool=8)
    for rr in (50, 90):
        other = rc.cornell_box_crop(imgs[rr], pool=8)
        mean_d, _ = rc.grid_diff(base, other, 8)
        assert mean_d < 0.02, f"RR ablation mean shift {mean_d:.4f} (rr={rr})"


def test_regen_offline_dof():
    from tools import make_goldens as mg

    u8, _ = mg.offline_dof(200, 112, 32)
    assert_close_u8(u8, _gold("offline_dof"), mean_tol=2.0, p99_tol=16)
