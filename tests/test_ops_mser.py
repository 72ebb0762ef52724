"""MSER proposal quality: synthetic exact cases + OpenCV-oracle recall.

OpenCV MSER's exact region set is not bit-reproducible (tie-breaking,
min_diversity pruning), so the real-frame check asserts recall of OpenCV's
boxes rather than set equality; end-to-end detection parity is covered by the
pipeline tests.
"""

import numpy as np
import pytest

from conftest import require_cv2

from opencv_traffic_sign_detector_tpu.config import MSERConfig
from opencv_traffic_sign_detector_tpu.ops.mser import mser_regions


def _iou_xywh(a, b):
    ax1, ay1, aw, ah = a
    bx1, by1, bw, bh = b
    ix = max(0, min(ax1 + aw, bx1 + bw) - max(ax1, bx1))
    iy = max(0, min(ay1 + ah, by1 + bh) - max(ay1, by1))
    inter = ix * iy
    union = aw * ah + bw * bh - inter
    return inter / union if union > 0 else 0.0


def test_dark_square_detected_exactly():
    img = np.full((128, 128), 200, np.uint8)
    img[20:50, 30:60] = 40  # 30x30 dark square, area 900
    cfg = MSERConfig(delta=7, min_area=200, max_area=2000, max_variation=1.0,
                     max_regions=64)
    boxes, valid = mser_regions(img, cfg)
    boxes = np.asarray(boxes)[np.asarray(valid)]
    assert len(boxes) >= 1
    best = max(_iou_xywh(b, (30, 20, 30, 30)) for b in boxes)
    assert best > 0.95


def test_bright_square_detected_via_inverted_polarity():
    img = np.full((128, 128), 30, np.uint8)
    img[60:90, 10:40] = 220
    cfg = MSERConfig(delta=7, min_area=200, max_area=2000, max_variation=1.0,
                     max_regions=64)
    boxes, valid = mser_regions(img, cfg)
    boxes = np.asarray(boxes)[np.asarray(valid)]
    assert len(boxes) >= 1
    best = max(_iou_xywh(b, (10, 60, 30, 30)) for b in boxes)
    assert best > 0.95


def test_sweep_res_refine_matches_native_box_geometry():
    """The sweep_res_pipeline knob refines at sweep resolution and scales
    boxes back: on a clean square the native-coord box must land within
    `downscale` px of the native-refined one."""
    img = np.full((128, 160), 200, np.uint8)
    img[40:76, 60:96] = 35  # 36x36 dark square
    base = dict(delta=7, min_area=200, max_area=2000, max_variation=1.0,
                max_regions=64, downscale=2, ccl_iters=16, ccl_jumps=0)
    b_nat, v_nat = mser_regions(img, MSERConfig(**base))
    b_low, v_low = mser_regions(
        img, MSERConfig(**base, sweep_res_pipeline=True)
    )
    b_nat = np.asarray(b_nat)[np.asarray(v_nat)]
    b_low = np.asarray(b_low)[np.asarray(v_low)]
    assert len(b_nat) >= 1 and len(b_low) >= 1
    target = (60, 40, 36, 36)
    best_nat = max(b_nat, key=lambda b: _iou_xywh(b, target))
    best_low = max(b_low, key=lambda b: _iou_xywh(b, target))
    assert _iou_xywh(best_low, target) > 0.85
    assert np.abs(np.asarray(best_low) - np.asarray(best_nat)).max() <= 2


def test_area_window_respected():
    img = np.full((128, 128), 200, np.uint8)
    img[10:14, 10:14] = 40  # 16 px — below min_area
    img[40:120, 30:110] = 40  # 6400 px — above max_area
    cfg = MSERConfig(delta=5, min_area=200, max_area=2000, max_variation=1.0,
                     max_regions=64)
    boxes, valid = mser_regions(img, cfg)
    boxes = np.asarray(boxes)[np.asarray(valid)]
    for b in boxes:
        assert _iou_xywh(b, (10, 10, 4, 4)) < 0.5
        assert _iou_xywh(b, (30, 40, 80, 80)) < 0.5


@pytest.mark.slow
def test_recall_vs_opencv_on_real_crop(test_frames_dir):
    cv2 = require_cv2()
    img = cv2.imread(str(test_frames_dir / "00601.jpg"))
    g = cv2.cvtColor(img, cv2.COLOR_BGR2GRAY)
    g = cv2.createCLAHE(clipLimit=2).apply(g)
    g = cv2.GaussianBlur(g, (3, 3), 0)
    lut = np.array([((i / 255) ** 0.5) * 255 for i in range(256)], np.uint8)
    g = cv2.LUT(g, lut)
    crop = g[384:640, 0:256]  # contains the prohibicion sign at (82, 450)

    cfg = MSERConfig(delta=7, min_area=200, max_area=2000, max_variation=1.0,
                     max_regions=512)
    boxes, valid = mser_regions(crop, cfg)
    ours = np.asarray(boxes)[np.asarray(valid)]

    mser = cv2.MSER_create(delta=7, min_area=200, max_area=2000,
                           max_variation=1.0)
    ref = mser.detectRegions(crop)[1]
    assert len(ref) > 0
    matched = sum(
        1 for rb in ref if any(_iou_xywh(rb, ob) >= 0.6 for ob in ours)
    )
    assert matched / len(ref) >= 0.75
    # don't over-generate unboundedly: nested duplicates are fine (downstream
    # dedup collapses them) but stay within a small multiple
    assert len(ours) <= 6 * len(ref) + 32

    # the sign itself (GT 00601: 82,450..145,508 -> crop coords 82,66..145,124)
    sign = (82, 66, 63, 58)
    assert any(_iou_xywh(sign, ob) >= 0.5 for ob in ours)


class TestFusedSweep:
    """Fused Pallas sweep (interpret mode) vs the XLA reference sweep."""

    @staticmethod
    def _sweeps(g, cfg):
        import jax.numpy as jnp

        from opencv_traffic_sign_detector_tpu.ops import mser as M
        from opencv_traffic_sign_detector_tpu.ops.mser_pallas import (
            fused_level_sweep_full,
        )

        s = cfg.level_step if cfg.level_step > 0 else cfg.delta
        d_idx = max(1, round(cfg.delta / s))
        levels = list(range(0, 256 + (d_idx + 1) * s + 1, s))
        gq = jnp.asarray(g)
        both = jnp.stack([gq.astype(jnp.int32), 255 - gq.astype(jnp.int32)])
        im2 = jnp.pad(both, ((0, 0), (1, 1), (1, 1)), constant_values=255)
        sb_x = np.asarray(M._level_sweep(im2, levels, cfg, d_idx))
        sb_f = np.asarray(
            fused_level_sweep_full(im2, cfg, d_idx, len(levels), interpret=True)
        )
        h, w = im2.shape[1:]
        sb_x4 = sb_x.reshape(len(levels), 2, h, w).transpose(1, 0, 2, 3)
        return sb_x4, sb_f

    def test_rectangles_agree_with_xla_sweep(self):
        # solid rectangles: bbox area == pixel area, so the two stability
        # definitions coincide and candidate maps should nearly match
        g = np.full((126, 158), 200, np.uint8)
        g[40:60, 50:70] = 30
        g[80:100, 100:124] = 90
        cfg = MSERConfig(min_area=60, max_area=1200, max_variation=1.0,
                         level_step=5, ccl_iters=16, ccl_jumps=0,
                         max_regions=32)
        sb_x4, sb_f = self._sweeps(g, cfg)
        assert (sb_x4 == sb_f).mean() > 0.999
        # both squares found by the fused sweep at their anchor pixel
        assert sb_f[0, :, 41, 51].max() > 0
        assert sb_f[0, :, 81, 101].max() > 0

    def test_min_diversity_prunes_nested_reemissions(self):
        g = np.full((126, 158), 200, np.uint8)
        g[40:60, 50:70] = 30
        base = dict(min_area=60, max_area=1200, max_variation=1.0,
                    level_step=5, ccl_iters=16, ccl_jumps=0, max_regions=32)
        cfg_div = MSERConfig(min_diversity=0.2, **base)
        cfg_nodiv = MSERConfig(min_diversity=0.0, **base)
        _, sb_div = self._sweeps(g, cfg_div)
        _, sb_nodiv = self._sweeps(g, cfg_nodiv)
        n_div = (sb_div[0, :, 41, 51] > 0).sum()
        n_nodiv = (sb_nodiv[0, :, 41, 51] > 0).sum()
        # a constant-size region must emit exactly once under diversity
        # pruning (it never grows), vs once per stable level without
        assert n_div == 1
        assert n_nodiv > 3

    def test_fused_pipeline_detects_square_on_cpu_interpret(self):
        # whole mser_regions path with the fused sweep forced via interpret
        from opencv_traffic_sign_detector_tpu.ops import mser_pallas

        g = np.full((126, 158), 200, np.uint8)
        g[40:60, 50:70] = 30
        cfg = MSERConfig(min_area=60, max_area=1200, max_variation=1.0,
                         level_step=5, ccl_iters=16, ccl_jumps=0,
                         max_regions=32)
        sb_x4, sb_f = self._sweeps(g, cfg)
        # top-k pooled decode finds the square's anchor
        import jax.numpy as jnp

        from opencv_traffic_sign_detector_tpu.ops.mser import mser_regions

        # (pooled decode is exercised on TPU; here assert candidate parity)
        assert sb_f[0, :, 41, 51].max() == sb_x4[0, :, 41, 51].max()


def test_extent_only_sweep_matches_on_squares():
    """Extent-only (3-channel) fused sweep: squared-height area proxy equals
    bbox area on square components, so candidate maps must match the full
    5-channel fused sweep there."""
    import jax.numpy as jnp

    from opencv_traffic_sign_detector_tpu.ops.mser_pallas import (
        fused_level_sweep_full,
    )

    g = np.full((126, 158), 200, np.uint8)
    g[40:60, 50:70] = 30
    g[80:100, 100:120] = 90
    base = dict(min_area=60, max_area=1200, max_variation=1.0,
                level_step=5, ccl_iters=16, ccl_jumps=0, max_regions=32)
    cfg5 = MSERConfig(**base)
    cfg3 = MSERConfig(sweep_extent_only=True, **base)
    s = 5
    d_idx = 1
    levels = list(range(0, 256 + (d_idx + 1) * s + 1, s))
    gq = jnp.asarray(g)
    both = jnp.stack([gq.astype(jnp.int32), 255 - gq.astype(jnp.int32)])
    im2 = jnp.pad(both, ((0, 0), (1, 1), (1, 1)), constant_values=255)
    sb5 = np.asarray(fused_level_sweep_full(im2, cfg5, d_idx, len(levels), interpret=True))
    sb3 = np.asarray(fused_level_sweep_full(im2, cfg3, d_idx, len(levels), interpret=True))
    assert sb3[0, :, 41, 51].max() > 0
    assert sb3[0, :, 81, 101].max() > 0
    np.testing.assert_array_equal(sb3[0, :, 41, 51], sb5[0, :, 41, 51])
    np.testing.assert_array_equal(sb3[0, :, 81, 101], sb5[0, :, 81, 101])


@pytest.mark.slow
def test_scan_propagation_matches_roll_candidates():
    """Scan-based propagation (segmented full-run resolves per axis) must
    find the same candidate set as the converged roll propagation; full
    convergence may legally emit a slow-to-flood shape a step earlier."""
    import jax.numpy as jnp

    from opencv_traffic_sign_detector_tpu.ops.mser_pallas import (
        fused_level_sweep_full,
    )

    g = np.full((126, 158), 200, np.uint8)
    g[40:60, 50:70] = 30
    g[80:100, 100:140] = 90
    g[20:30, 10:15] = 60
    g[70:110, 20:30] = 45
    g[100:110, 20:60] = 45
    base = dict(min_area=20, max_area=3000, max_variation=1.0, level_step=5,
                ccl_iters=24, ccl_jumps=0, max_regions=64)
    s, d_idx = 5, 1
    levels = list(range(0, 256 + (d_idx + 1) * s + 1, s))
    gq = jnp.asarray(g)
    both = jnp.stack([gq.astype(jnp.int32), 255 - gq.astype(jnp.int32)])
    im2 = jnp.pad(both, ((0, 0), (1, 1), (1, 1)), constant_values=255)
    sb_roll = np.asarray(
        fused_level_sweep_full(im2, MSERConfig(**base), d_idx, len(levels),
                          interpret=True)
    )
    sb_scan = np.asarray(
        fused_level_sweep_full(im2, MSERConfig(scan_passes=2, **base), d_idx,
                          len(levels), interpret=True)
    )
    anchors_roll = {(p, y, x) for p, _, y, x in zip(*np.nonzero(sb_roll))}
    anchors_scan = {(p, y, x) for p, _, y, x in zip(*np.nonzero(sb_scan))}
    assert anchors_scan == anchors_roll
    # expected anchors: one per synthetic shape, dark polarity
    assert anchors_roll == {(0, 41, 51), (0, 81, 101), (0, 21, 11), (0, 71, 21)}


class TestPooledTiledSweep:
    """The production pooled/strip-tiled sweep vs the full byte-map oracle."""

    @staticmethod
    def _setup(g, cfg):
        import jax.numpy as jnp

        s = cfg.level_step if cfg.level_step > 0 else cfg.delta
        d_idx = max(1, round(cfg.delta / s))
        levels = list(range(0, 256 + (d_idx + 1) * s + 1, s))
        gq = jnp.asarray(g)
        both = jnp.stack([gq.astype(jnp.int32), 255 - gq.astype(jnp.int32)])
        im2 = jnp.pad(both, ((0, 0), (1, 1), (1, 1)), constant_values=255)
        return im2, levels, d_idx

    @staticmethod
    def _expected_packed(sb_full, lbits, hp, wp):
        """Reference level collapse of the full [P, L, H, W] byte map."""
        p, nl, h, w = sb_full.shape
        x = np.zeros((p, nl, hp, wp), np.int64)
        x[:, :, :h, :w] = sb_full
        lv = np.arange(nl)[None, :, None, None]
        return (x * (1 << lbits) + lv).max(axis=1)

    def test_collapsed_output_matches_full_map(self):
        import numpy as np

        from opencv_traffic_sign_detector_tpu.ops.mser_pallas import (
            fused_level_sweep,
            fused_level_sweep_full,
            packing_bits,
            sweep_plan,
        )

        g = np.full((126, 158), 200, np.uint8)
        g[40:60, 50:70] = 30
        g[80:100, 100:124] = 90
        cfg = MSERConfig(min_area=60, max_area=1200, max_variation=1.0,
                         level_step=5, ccl_iters=16, ccl_jumps=0,
                         max_regions=32, topk_pool=4)
        im2, levels, d_idx = self._setup(g, cfg)
        sb_full = np.asarray(
            fused_level_sweep_full(im2, cfg, d_idx, len(levels),
                                   interpret=True)
        )
        packed = np.asarray(
            fused_level_sweep(im2, cfg, d_idx, len(levels), interpret=True)
        )
        plan = sweep_plan(im2.shape[1], im2.shape[2], cfg.topk_pool)
        assert plan[0] == 1  # single strip at this size
        _, lbits = packing_bits(cfg.topk_pool, len(levels))
        exp = self._expected_packed(sb_full, lbits,
                                    packed.shape[1], packed.shape[2])
        np.testing.assert_array_equal(packed, exp.astype(np.int64))

    def test_multi_strip_finds_candidates_in_every_strip(self, monkeypatch):
        import numpy as np

        from opencv_traffic_sign_detector_tpu.ops import mser_pallas as MP

        # shrink the budget so this 158-col frame needs several strips
        # (core 40 rows, halo 24 via _HALO patch)
        monkeypatch.setattr(MP, "_VMEM_PX", 160 * 88)
        monkeypatch.setattr(MP, "_HALO_MIN", 24)
        monkeypatch.setattr(MP, "_HALO_MAX", 24)
        g = np.full((256, 80), 200, np.uint8)
        g[20:44, 30:54] = 30     # strip 0
        g[120:144, 20:44] = 60   # middle strip, crosses a boundary region
        g[210:234, 40:64] = 90   # last strip
        cfg = MSERConfig(min_area=60, max_area=1200, max_variation=1.0,
                         level_step=5, ccl_iters=16, ccl_jumps=0,
                         max_regions=32, topk_pool=4)
        im2, levels, d_idx = self._setup(g, cfg)
        h, w = im2.shape[1], im2.shape[2]
        plan = MP.sweep_plan(h, w, cfg.topk_pool, MP.plan_halo(cfg))
        assert plan is not None and plan[0] >= 3, plan
        packed = np.asarray(
            MP.fused_level_sweep(im2, cfg, d_idx, len(levels),
                                 interpret=True)
        )
        _, lbits = MP.packing_bits(cfg.topk_pool, len(levels))
        sb = packed >> lbits  # per-pixel stability byte
        # each synthetic square's anchor (top-left + border pad) must emit
        for (ay, ax) in [(21, 31), (121, 21), (211, 41)]:
            assert sb[0, ay, ax] > 0, (ay, ax)

    def test_multi_strip_matches_single_strip_candidates(self, monkeypatch):
        import numpy as np

        from opencv_traffic_sign_detector_tpu.ops import mser_pallas as MP

        g = np.full((256, 80), 200, np.uint8)
        g[20:44, 30:54] = 30
        g[120:144, 20:44] = 60
        g[210:234, 40:64] = 90
        cfg = MSERConfig(min_area=60, max_area=1200, max_variation=1.0,
                         level_step=5, ccl_iters=16, ccl_jumps=0,
                         max_regions=32, topk_pool=4)
        im2, levels, d_idx = self._setup(g, cfg)
        single = np.asarray(
            MP.fused_level_sweep(im2, cfg, d_idx, len(levels),
                                 interpret=True)
        )
        monkeypatch.setattr(MP, "_VMEM_PX", 160 * 88)
        monkeypatch.setattr(MP, "_HALO_MIN", 24)
        monkeypatch.setattr(MP, "_HALO_MAX", 24)
        MP.fused_level_sweep.clear_cache()
        tiled = np.asarray(
            MP.fused_level_sweep(im2, cfg, d_idx, len(levels),
                                 interpret=True)
        )
        MP.fused_level_sweep.clear_cache()
        _, lbits = MP.packing_bits(cfg.topk_pool, len(levels))
        sb_s = single >> lbits
        sb_t = tiled[:, : sb_s.shape[1]] >> lbits
        # sign-sized components fit the halo, so candidate blocks agree
        np.testing.assert_array_equal(sb_t, sb_s)
