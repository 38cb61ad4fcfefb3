"""Structured logging/metrics (SURVEY §5.5 — the reference has only
scattered couts and a 'TODO: do proper logging', alembic.hpp:38)."""
import io
import json

from phosphorus_mk2_tpu.utils.log import LEVELS, Metrics, get_logger, set_level


def test_logger_levels(capsys):
    log = get_logger("test")
    set_level("warn")
    log.info("hidden")
    log.warn("shown")
    err = capsys.readouterr().err
    assert "hidden" not in err
    assert "shown" in err and "test" in err
    set_level("info")
    log.debug("quiet")
    log.info("loud")
    err = capsys.readouterr().err
    assert "quiet" not in err and "loud" in err


def test_metrics_emit_json_line():
    m = Metrics("render")
    m.inc("passes").inc("passes").set("spp", 16).lap("first_pass_s")
    buf = io.StringIO()
    rec = m.emit(out=buf)
    assert rec["event"] == "render"
    assert rec["passes"] == 2 and rec["spp"] == 16
    assert "wall_s" in rec and "first_pass_s" in rec
    # one parseable JSON line on the stream
    lines = buf.getvalue().strip().splitlines()
    assert len(lines) == 1
    assert json.loads(lines[0]) == rec


def test_verbose_render_emits_metrics(capsys):
    import jax

    from phosphorus_mk2_tpu.core.options import Options
    from phosphorus_mk2_tpu.renderer import Renderer
    from phosphorus_mk2_tpu.scenes import sphere_in_box

    scene = sphere_in_box(width=8, height=8)
    r = Renderer(
        scene,
        Options(
            samples_per_pixel=2, samples_per_pass=1, path_depth=1,
            use_bvh=False, verbose=True,
        ),
    )
    film = r.render()
    out = capsys.readouterr()
    rec = json.loads(out.out.strip().splitlines()[-1])
    assert rec["event"] == "render" and rec["passes"] == 2
    assert rec["mrays_per_s"] > 0 and rec["spp"] == 2
    assert "pass 2/2" in out.err
