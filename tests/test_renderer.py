"""Renderer session tests: progressive passes, checkpoint/resume."""
import numpy as np

from phosphorus_mk2_tpu.core.options import Options
from phosphorus_mk2_tpu.renderer import Renderer
from phosphorus_mk2_tpu.scenes import sphere_in_box


def test_progressive_passes_accumulate():
    scene = sphere_in_box(width=16, height=16)
    opts = Options(
        samples_per_pixel=4, samples_per_pass=2, path_depth=2, use_bvh=False
    )
    r = Renderer(scene, opts)
    films = [f for f, done in r.passes()]
    assert len(films) == 2
    for f in films:
        assert np.isfinite(f["color"]).all()


def test_checkpoint_resume_identical(tmp_path):
    scene = sphere_in_box(width=12, height=12)
    base = dict(samples_per_pixel=4, samples_per_pass=2, path_depth=2, use_bvh=False)

    # straight-through render
    full = Renderer(scene, Options(**base)).render()

    # render 1 pass with checkpointing, then resume in a new session
    ck = str(tmp_path / "ck")
    opts1 = Options(**base, checkpoint_dir=ck, checkpoint_every=1)
    r1 = Renderer(scene, opts1)
    gen = r1.passes()
    next(gen)  # one pass (2 spp) -> checkpoint written

    r2 = Renderer(scene, opts1)
    resumed = r2.render()

    np.testing.assert_allclose(resumed["color"], full["color"], atol=1e-6)


def test_checkpoint_refuses_mismatched_resume(tmp_path):
    """A checkpoint stamped by one render must not blend into another:
    resuming with a changed scene, resolution, or spp target fails
    loudly instead of silently mixing films (VERDICT weak #7)."""
    import pytest

    ck = str(tmp_path / "ck")
    base = dict(
        samples_per_pixel=4, samples_per_pass=2, path_depth=2, use_bvh=False,
        checkpoint_dir=ck, checkpoint_every=1,
    )
    scene = sphere_in_box(width=12, height=12)
    r1 = Renderer(scene, Options(**base))
    next(r1.passes())  # writes a checkpoint

    # changed spp target
    with pytest.raises(RuntimeError, match="different render"):
        Renderer(scene, Options(**{**base, "samples_per_pixel": 8})).render()

    # changed resolution
    with pytest.raises(RuntimeError, match="different render"):
        Renderer(sphere_in_box(width=16, height=16), Options(**base)).render()

    # changed scene geometry
    other = sphere_in_box(width=12, height=12)
    other.meshes[0].vertices = other.meshes[0].vertices * 1.01
    with pytest.raises(RuntimeError, match="different render"):
        Renderer(other, Options(**base)).render()

    # unchanged: resumes cleanly
    resumed = Renderer(scene, Options(**base)).render()
    assert np.isfinite(resumed["color"]).all()
