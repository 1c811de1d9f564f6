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
