"""Test config: force a local 8-device virtual CPU mesh.

The container preregisters a remote 'axon' TPU backend at interpreter
start (remote compile round-trips make it unusable for unit tests);
jax.config.update overrides it. Sharding tests use the 8 virtual CPU
devices (SURVEY.md §4 test strategy).
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

assert jax.devices()[0].platform == "cpu", jax.devices()
assert len(jax.devices()) == 8, jax.devices()

# --- slow-test tiering (round 5; VERDICT r4 next #9) --------------------
# Fast lane: `python -m pytest tests/ -m "not slow" -x -q` (< 5 min on
# the 2-core host) — the commit-loop gate. Full suite (~30 min) before
# milestone commits / round close. Centralized here instead of
# per-test decorators so the tier list tracks measured durations
# (tools: pytest --durations=60).
import pytest  # noqa: E402

_SLOW = (
    # file-wide families (every parametrization is >= 5 s)
    "test_tracer_tune.py::",
    "test_optim.py::",
    "test_mis.py::",
    "test_hierarchical.py::",
    "test_front_table.py::",
    "test_sharding.py::",
    # individual heavy tests
    "test_bvh.py::test_block_traversal_matches_brute_force",
    "test_bvh.py::test_bvh_matches_brute_force",
    "test_cli.py::test_cli_optimize_recovers_emission",
    "test_distributed.py::test_render_through_2d_mesh_bit_identical",
    "test_distributed.py::test_multichip_dryrun",
    "test_grad.py::test_grad_multi_type_scene_dense_dispatch",
    "test_grad.py::test_gradients_match_finite_differences",
    "test_grad.py::test_trainable_scoping_grads_identical",
    "test_grad.py::test_vertex_grads_finite_with_environment_light",
    "test_grad.py::test_sorted_dispatch_grads_match_dense",
    "test_radiometry.py::test_golden_statistics_sphere_in_box",
    "test_renderer.py::test_checkpoint_resume_identical",
    "test_sort.py::test_sorted_trace_matches_unsorted",
    "test_texture.py::test_aniso_preserves_cross_axis_detail",
    "test_texture.py::test_aniso_render_beats_isotropic_at_grazing",
    "test_texture.py::test_textured_render_minification_filtered",
    "test_texture.py::test_textured_render_shows_checker",
)


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: > ~10 s on the 2-core host; excluded from the "
        "fast lane (-m 'not slow')"
    )


def pytest_collection_modifyitems(config, items):
    for item in items:
        key = f"{item.fspath.basename}::{item.name}"
        if any(key.startswith(p) for p in _SLOW):
            item.add_marker(pytest.mark.slow)
