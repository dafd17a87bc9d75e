"""Test configuration: force JAX onto CPU with 8 virtual devices.

Tests never require TPU hardware; multi-device (data-parallel) paths are
exercised on a virtual 8-device CPU mesh via
``--xla_force_host_platform_device_count`` (the SURVEY.md §4 test strategy).
Must run before the first ``import jax`` in any test module.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon TPU plugin ignores the JAX_PLATFORMS env var; the config update
# is authoritative and must happen before any backend is initialized.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

assert jax.default_backend() == "cpu", "tests must run on the CPU backend"
assert jax.device_count() == 8, "tests expect the virtual 8-device CPU mesh"


# --- Test tiering -----------------------------------------------------------
# One place, duration-derived (full-suite --durations capture, round 5):
# every test measured over ~5s on the virtual mesh is `slow`, so
# `pytest -m "not slow"` is the quick dev loop (~3 min) while CI and
# pre-commit runs keep the full suite. Parametrized tests are listed by
# base name (marks apply to every variant). The sets are validated at
# collection time: a stale (renamed/removed) entry fails collection
# loudly instead of silently un-marking a slow test.

_SLOW_MODULES = {"test_daemon_e2e.py", "test_distributed.py"}
_SUBPROCESS_MODULES = {"test_daemon_e2e.py", "test_distributed.py"}
_SLOW_TESTS = {
    "test_cli.py": {
        "test_gatys_end_to_end_tiny", "test_gatys_batched_directory_cli",
        "test_gatys_style_blend_cli", "test_gatys_coarse_to_fine_cli",
    },
    "test_models.py": {
        "test_padearly_phase_decoder_grad_flows",
        "test_padearly_phase_decoder_matches_stacked",
        "test_apply_non_multiple_of_four_sizes",
        "test_transformer_output_shape",
        "test_perceptual_loss_grad_flows",
        "test_padearly_phase_decoder_conditional_affines",
    },
    "test_entry.py": {"test_dryrun_multichip_8"},
    "test_multistyle.py": {
        "test_unused_style_embedding_gets_no_gradient",
        "test_multistyle_train_and_convert_cli",
        "test_multistyle_training_step",
        "test_style_selection_matches_single_style_net",
    },
    "test_engines.py": {
        "test_gatys_coarse_to_fine_lbfgs_variants",
        "test_video_train_end_to_end_synthetic",
        "test_fast_train_step_updates_params_and_reduces_loss",
        "test_fast_static_train_epoch_checkpoint_and_resume",
        "test_video_serve_size_buckets_per_stream",
        "test_remat_train_step_matches_plain",
        "test_video_serve_batched_stress_interleaved_streams",
        "test_video_serve_lone_lane_eviction_protects_wave",
        "test_stylize_clip_recurrence_matches_manual",
        "test_gatys_history_size_flows_through_and_still_converges",
        "test_gatys_batched_lbfgs_images_are_independent",
        "test_padded_tail_frames_take_no_update",
        "test_video_serve_eviction_protects_same_wave_streams",
        "test_gatys_serve_loop_batched_mixed_styles",
        "test_video_scan_train_step_and_freeze_mask",
        "test_video_serve_multi_stream_batched_matches_scan",
    },
    "test_video_io.py": {
        "test_process_video_dir_batched", "test_process_video_end_to_end",
        "test_process_video_save_frames_workdir",
    },
    "test_step_ckpt.py": {
        "test_static_train_step_checkpoint_resume",
        "test_video_train_step_checkpoint",
        "test_video_train_exact_resume_mid_batch",
        "test_resume_position_disagreement_degrades_collectively",
    },
    "test_scripts.py": {"test_fetch_vgg19_converts_local_pth"},
    "test_parallel.py": {
        "test_dp_step_overhead_is_bounded",
        "test_dp_loss_and_grads_match_single_device",
    },
    "test_reference_parity.py": {
        "test_real_image_gatys_closure_matches_reference",
        "test_reference_pth_checkpoint_loads_and_matches",
        "test_gatys_lbfgs_trajectory_matches_reference",
        "test_real_image_fast_forward_matches_reference",
    },
    "test_golden.py": {
        "test_transformer_forward_golden", "test_train_step_golden",
    },
    "test_tb.py": {"test_loads_in_tensorboard_if_available"},
}
_SUBPROCESS_TESTS = {
    "test_doctor.py": {"test_cpu_backend_probe_subprocess"},
    "test_utils.py": {"test_platform_env_knob_forces_cpu_backend"},
    "test_scripts.py": {
        "test_fetch_vgg19_converts_local_pth",
        "test_fetch_vgg19_rejects_wrong_structure",
        "test_perceptual_quality_with_real_weights",
    },
}


def pytest_collection_modifyitems(config, items):
    seen: dict = {}
    for item in items:
        fname = item.path.name
        base = item.name.split("[")[0]
        seen.setdefault(fname, set()).add(base)
        if fname in _SLOW_MODULES or base in _SLOW_TESTS.get(fname, ()):
            item.add_marker(pytest.mark.slow)
        if (fname in _SUBPROCESS_MODULES
                or base in _SUBPROCESS_TESTS.get(fname, ())):
            item.add_marker(pytest.mark.subprocess)
    # Stale-entry guard: only when the whole suite was collected (a -k or
    # single-file run legitimately misses entries).
    if config.args in ([], ["tests"], ["tests/"]) and not config.option.keyword:
        stale = []
        for table in (_SLOW_TESTS, _SUBPROCESS_TESTS):
            for fname, names in table.items():
                missing = names - seen.get(fname, set())
                stale += [f"{fname}::{n}" for n in missing]
        # Module-level entries go stale the same way (a renamed module
        # file would silently un-tier every test in it).
        stale += sorted((_SLOW_MODULES | _SUBPROCESS_MODULES)
                        - set(seen.keys()))
        if stale:
            raise pytest.UsageError(
                "conftest tier tables list tests that no longer exist "
                f"(rename them in conftest.py too): {sorted(stale)}"
            )


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture
def tmp_image(tmp_path, rng):
    """A small RGB image file on disk."""
    from PIL import Image

    arr = rng.integers(0, 256, size=(64, 48, 3), dtype=np.uint8)
    path = tmp_path / "img.png"
    Image.fromarray(arr).save(path)
    return str(path)
