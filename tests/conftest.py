"""Test env: force CPU backend with 8 fake devices BEFORE jax import.

This is the standard JAX fake-backend idiom for testing multi-device
sharding without a TPU slice (SURVEY.md §4.4). All tests run on CPU; the
real-chip paths are exercised by bench.py / __graft_entry__.py.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

# Something in this image's site config pins JAX_PLATFORMS=axon (the TPU
# tunnel plugin) regardless of the env var, so pin the platform explicitly
# too — must happen before any backend is initialized.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


# ---------------------------------------------------------------------------
# Test tiers (VERDICT r4 item 7: the full suite is ~10-16 min on this 1-core
# host, which means it stops being run mid-iteration).
#
#   quick : < ~2 min total (cold jit caches) — at least one representative test from every
#           module; run with  `pytest -m quick`  on every edit loop.
#   slow  : multi-minute tests (subprocess launches, long phantom training,
#           interpret-mode kernels at scale); excluded by `-m "not slow"`.
#   (default, no marker): everything else; `pytest` runs all tiers.
#
# Curated from measured per-test durations (pytest --durations=0,
# 2026-08-20); keep each module's entries among its fastest meaningful
# tests when adding here.
# ---------------------------------------------------------------------------

_QUICK = {
    "test_bench_params.py": {"test_numerics_fields_do_invalidate",
                             "test_fingerprint_distinguishes_presets"},
    "test_cascade.py": {"test_transfer_quant_roundtrip_error_bound",
                        "test_evaluate_cases_summary",
                        "test_cascade_empty_coarse_mask",
                        "test_xla_over_fused_artifact_sourced"},
    "test_cli_viz.py": {"test_visualize_panel"},
    "test_data.py": {"test_augment_deterministic_given_key",
                     "test_sampler_patch_larger_than_volume"},
    "test_deep_supervision.py": {"test_ds_loss_reduces_to_plain_without_aux"},
    "test_ensemble.py": {"test_cli_spec_loads_ensemble"},
    "test_fingerprint.py": {"test_fingerprint_reflects_dataset",
                            "test_plan_json_roundtrips_through_get_config"},
    "test_fused_block.py": {"test_conv3x3_dchw_m_w_edges_zero_padded",
                            "test_conv3x3_dchw_matches_reference",
                            "test_conv3x3_dchw_m_grads_match_reference"},
    "test_http_serve.py": {"test_predict_matches_in_process",
                           "test_plain_fine_only_service"},
    "test_infer.py": {"test_component_bounding_boxes_native_matches_argwhere",
                      "test_sliding_window_volume_smaller_than_patch"},
    "test_kernels.py": {"test_fused_norm_parity[bfloat16-shape0]"},
    "test_loss.py": {"test_ce_matches_manual", "test_hard_dice_per_class",
                     "test_kits_composite"},
    "test_model.py": {"test_instance_norm_reference_fn",
                      "test_instance_norm_large_mean_no_nan"},
    "test_nifti.py": {"test_affine_roundtrip", "test_scl_slope_inter"},
    "test_packing.py": {"test_cascade_quality_unchanged_by_packing"},
    # test_pallas_conv.py: interpret-mode only — 15 s cold; covered by the
    # fused_block entries above. Runs in the default tier.
    "test_parallel.py": {"test_gspmd_jit_matches_shard_map"},
    "test_renal_anatomy.py": {"test_cascade_five_class_oracle"},
    "test_resample.py": {"test_normalize_fixed_stats",
                         "test_linear_matches_scipy_golden[scale1]"},
    "test_robustness.py": {"test_checkpoint_keep_best"},
    "test_spatial.py": {"test_spatial_forward_rejects_halo_zero"},
    "test_surface_mesh.py": {"test_mesh_is_watertight_and_genus_zero",
                             "test_obj_writer"},
    # test_torch_oracle.py: torch import alone is ~10 s cold. Default tier.
    "test_train.py": {"test_lr_schedule_shapes"},
    "test_train_extras.py": {"test_loop_steps_per_dispatch_validates_intervals"},
    "test_tta.py": {"test_tta_probs_are_mean_of_flip_variant_probs"},
    "test_upsample.py": {"test_depth_to_space_layout",
                         "test_pixelshuffle_equals_convtranspose_with_mapped_weights"},
    "test_utils.py": {"test_phase_timer_accumulates",
                      "test_device_sync_handles_trees"},
}

# Multi-minute tests not already marked slow in their files (measured):
_SLOW = {
    "test_bench_quality.py": {"test_committed_params_cascade_quality"},  # 112 s
    "test_compile_census.py": {"test_compile_class_census"},  # 46-60 s
    "test_cascade.py": {"test_predict_cases_device_lanes_match_sequential"},  # 25 s
    "test_fused_block.py": {"test_unet_fused_grads_finite_and_close[v1]"},  # 17 s
    "test_train.py": {"test_overfit_single_patch"},  # 15 s
    "test_model.py": {"test_unet_gradients_finite"},  # 12 s
}


def pytest_collection_modifyitems(config, items):
    import pytest as _pytest

    for item in items:
        fname = item.path.name if hasattr(item, "path") else item.fspath.basename
        if item.name in _QUICK.get(fname, ()):
            item.add_marker(_pytest.mark.quick)
        if item.name in _SLOW.get(fname, ()):
            item.add_marker(_pytest.mark.slow)
