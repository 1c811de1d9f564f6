"""Frame-loop driver tests (VERDICT r1 item 5): a scripted session —
move -> preview quality -> stop -> full-quality re-converge ->
screenshot / telemetry / auto-screenshot — matching dispatch.java:593-802.
"""
import os

import numpy as np
import pytest

from pathtracer0_tpu import RenderConfig
from pathtracer0_tpu.render.driver import FrameLoopDriver


@pytest.fixture()
def driver(simple_scene, tmp_path):
    dev, info = simple_scene.build()
    cfg = RenderConfig(width=64, height=48, samples_per_frame=2,
                       max_bounces=2, auto_focus=False, blur=0.0)
    return FrameLoopDriver(
        dev, info, cfg, cam_pos=(0.0, 0.0, 0.0),
        auto_screenshot_after=3, screenshot_dir=str(tmp_path),
        preview_frames=2,
    )


class TestAdaptivePreview:
    def test_move_drops_to_preview_quality(self, driver):
        """While moving, frames render at the reference's 500px/4spp/
        2-bounce preview config (dispatch.java:649-662)."""
        driver.tick()                      # still frame at full quality
        assert driver.renderer._count == 1
        driver.submit("move 0 0 0.5")
        assert driver.moving
        img = driver.tick()
        pc = driver.preview_config
        assert img.shape == (pc.height, pc.width, 3)
        assert pc.width == 500 and pc.samples_per_frame == 4 \
            and pc.max_bounces == 2
        assert driver.preview_renderer._count == 1

    def test_stop_restores_full_quality_and_resets(self, driver):
        driver.tick()
        driver.submit("move 0 0 0.5")
        driver.tick()                      # preview 1
        driver.tick()                      # preview 2 (preview_frames=2)
        assert not driver.moving
        img = driver.tick()                # full quality again
        cfg = driver.full_config
        assert img.shape == (cfg.height, cfg.width, 3)
        # accumulation was RESET on restore: count restarts from 1
        assert driver.renderer._count == 1
        assert driver.frames_still == 1

    def test_accumulation_reconverges_after_stop(self, driver):
        driver.submit("move 0 0 1.0")
        for _ in range(2):
            driver.tick()
        imgs = [np.asarray(driver.tick()) for _ in range(3)]
        # progressive accumulation: display image changes as frames fold in
        assert not np.array_equal(imgs[0], imgs[1])
        assert driver.renderer._count == 3


class TestCommands:
    def test_telemetry_format(self, driver):
        driver.submit("move 1 2 3")
        reply = driver.submit("telemetry")
        assert "Camera Position" in reply and "(1.0,2.0,3.0)" in reply

    def test_screenshot_command(self, driver, tmp_path):
        driver.tick()
        path = driver.submit("screenshot shot.png")
        assert os.path.exists(path)

    def test_auto_screenshot_after_still_frames(self, driver):
        for _ in range(3):
            driver.tick()
        assert driver.last_screenshot is not None
        assert "autoScreenshot_" in driver.last_screenshot
        assert os.path.exists(driver.last_screenshot)
        before = driver.last_screenshot
        driver.tick()                      # no re-trigger while still
        assert driver.last_screenshot == before

    def test_key_movement_conventions(self, driver):
        """'w' moves along +z when unrotated; speed scaling via '='/'-'
        (dispatch.java:742-776)."""
        driver.submit("w")
        np.testing.assert_allclose(driver.cam_pos, [0.0, 0.0, 0.5],
                                   atol=1e-6)
        driver.submit("=")
        driver.submit("e")                 # vertical, 10x speed now
        np.testing.assert_allclose(driver.cam_pos, [0.0, 5.0, 0.5],
                                   atol=1e-5)
        driver.submit("left")
        assert driver.cam_rot[1] == pytest.approx(0.15)

    def test_quit(self, driver):
        out = driver.run_script(["quit", None, None])
        assert driver.closed
        assert driver.renderer._count == 0  # no frame after quit

    def test_scripted_session(self, driver, tmp_path):
        """The VERDICT item-5 acceptance script: move -> preview -> stop ->
        full-quality re-converge -> screenshot."""
        replies = driver.run_script(
            [None, "move 0 0 0.5", None, None, None, "screenshot end.png"],
            trailing_frames=1,
        )
        assert any(str(tmp_path) in r for r in replies)
        assert driver.renderer._count >= 2  # re-converged at full quality


class TestWatchdog:
    """Render-anomaly watchdog (VERDICT r3 #9; reference analogue: the
    FPS > 4000 crash heuristic closes the window, dispatch.java:611-615)."""

    def test_nan_accumulation_aborts(self, driver):
        import jax.numpy as jnp

        driver.watchdog_every = 2
        driver.tick()
        assert driver.anomaly is None and not driver.closed
        # inject a crashed render: poison the accumulation buffer
        driver.renderer._sum = driver.renderer._sum.at[0, 0, 0].set(
            jnp.float32(np.nan))
        driver.tick()  # frames_still hits the watchdog cadence
        assert driver.anomaly == "non-finite accumulation"
        assert driver.closed

    def test_all_black_reported_not_fatal(self):
        from pathtracer0_tpu import RenderConfig, Scene

        sc = Scene()
        sc.set_constant_sky((0.0, 0.0, 0.0))  # pitch-black empty scene
        sc.add_material("m")
        dev, info = sc.build()
        cfg = RenderConfig(width=32, height=24, samples_per_frame=1,
                           max_bounces=2, auto_focus=False, blur=0.0)
        logs = []
        drv = FrameLoopDriver(dev, info, cfg, watchdog_every=1,
                              log=lambda m: logs.append(m))
        drv.tick()
        assert drv.anomaly == "all-black accumulation"
        assert not drv.closed  # report only: empty scenes are legal
        assert any("watchdog" in m for m in logs)

    def test_healthy_render_untouched(self, driver):
        driver.watchdog_every = 1
        for _ in range(3):
            driver.tick()
        assert driver.anomaly is None and not driver.closed


def test_pick_overlay(driver):
    """In-image mouse inspector (VERDICT r3 #10; frag.glsl:888-893):
    pixels within 0.5% of the cursor display the picked normal."""
    driver.tick()
    r = driver.renderer
    cfg = r.config
    px, py = cfg.width // 2, cfg.height // 2
    rec = r.pick(px, py)
    img = r.display_image_with_pick(px, py, radius=0.02)
    base = np.asarray(r.display_image())
    assert img.shape == base.shape
    # the cursor pixel shows the normal exactly
    np.testing.assert_allclose(img[py, px], rec["normal"], atol=0)
    # pixels far from the cursor are untouched
    np.testing.assert_array_equal(img[0, 0], base[0, 0])
