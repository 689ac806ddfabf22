"""Debug-viz parity tests (reference visualize_model, carla_model.h:336-552)."""

import numpy as np
import scipy.stats

from ppo_tpu.models.debug_viz import (
    COLOR_ALUMINIUM_5,
    COLOR_BLUE,
    COLOR_WHITE,
    beta_pdf,
    colorize_bev,
    visualize_model,
)


def test_beta_pdf_vs_scipy():
    xs = np.linspace(0.01, 0.99, 50)
    for a, b in [(1.5, 2.5), (4.0, 1.2), (1.0, 1.0)]:
        np.testing.assert_allclose(
            beta_pdf(xs, a, b), scipy.stats.beta.pdf(xs, a, b), rtol=1e-6
        )


def test_colorize_palette():
    bev = np.zeros((8, 8, 3), np.uint8)
    bev[0, 0, 0] = 128   # road
    bev[1, 1, 1] = 255   # lane
    bev[2, 2, 2] = 255   # car
    img = colorize_bev(bev)
    assert tuple(img[0, 0]) == COLOR_ALUMINIUM_5
    assert tuple(img[1, 1]) == COLOR_WHITE
    assert tuple(img[2, 2]) == COLOR_BLUE
    assert tuple(img[4, 4]) == (0, 0, 0)


def test_visualize_model_frame():
    h, w = 96, 96
    bev = (np.random.default_rng(0).random((h, w, 3)) > 0.7).astype(np.uint8) * 255
    frame = visualize_model(
        bev,
        measurements=np.linspace(-1, 1, 8, dtype=np.float32),
        value_measurements=np.zeros(4, np.float32),
        alpha=np.array([2.0, 3.0]),
        beta=np.array([2.0, 1.5]),
        action_scaled=np.array([0.5, 0.8]),
        value=1.23,
    )
    # 4x upscale, hconcat of bev and panel (carla_model.h:372)
    assert frame.shape == (h * 4, 2 * w * 4, 3) and frame.dtype == np.uint8
    # pdf/guides drawn: some pure green and some pure yellow pixels exist
    flat = frame.reshape(-1, 3)
    assert (flat == (0, 255, 0)).all(-1).any()
    assert (flat == (255, 255, 0)).all(-1).any()
