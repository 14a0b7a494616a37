"""Test configuration: CPU backend, x64, 8 virtual devices for sharding tests.

The container's site hook force-registers the remote TPU ("axon") platform and
programmatically overrides JAX_PLATFORMS, so the env var alone is not enough —
the backend must be pinned via jax.config before any computation runs
(SURVEY.md §4: multi-device tests run on a virtual CPU mesh).
"""

import os

import jax
import pytest

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", True)


# ---------------------------------------------------------------------------
# Slow-test tiering (VERDICT round 4 weak #6): the full suite is ~35 min on
# this 1-core box; `-m "not slow"` runs a ~5-minute core. Marks are assigned
# centrally here (measured >= ~15 s/test on the reference run — pytest
# --durations) instead of decorating 40 call sites; parameterized variants
# inherit the mark via the bare test name.
# ---------------------------------------------------------------------------

_SLOW = {
    "test_parallel.py": {
        "test_blocked_qr_r_sharded_matches_replicated",
        "test_blocked_qr_uneven_panels",
        "test_blocked_qr_matches_dense_qr",
        "test_gram_rowsharded_and_whiten_pipeline",
        "test_sharded_steady_convergence_chunked_and_promoted",
        "test_steady_dt_sweep_matches_sequential",
        "test_sharded_init_matches_single_device",
        "test_solver_level_factorization_hook",
        "test_space_sharded_steady_state_matches_single_device",
        "test_sharded_steady_seed_polishes_in_few_iterations",
        "test_sda_sharded_matches_dense_doubling",
        "test_sharded_adaptive_solve_matches_single_device",
    },
    "test_steady_state.py": {
        "test_steady_state_through_two_qr_householder_hook",
        "test_converged_factors_are_a_fixed_point",
    },
    "test_pdefilter.py": {"test_system_solvers_no_nans"},
    "test_distributed.py": {"test_two_process_cpu_dryrun"},
    "test_float32.py": {
        "test_fine_dx_pipeline_under_x32_mode",
        "test_solve_under_x32_mode",
    },
    "test_comm_model.py": {"test_two_qr_step_collectives_match_model"},
    # the Pallas-interpreter LQ engine tests are wall-clock dominated by
    # the interpreter itself; the module's sub-15s exact-value tests stay
    # in the fast core
    "test_qr_householder.py": {
        "test_latent_two_qr_routing_through_hook",
        "test_lq_paired_columns_matches_single",
        "test_propagate_banded_and_interleaved_match_gram",
        "test_lq_block_panel_matches_leaf_panel",
        "test_white_solve_propagate_band_matches_default",
        "test_white_solver_householder_init_and_step",
        "test_update_blocks_banded_matches_dense",
        "test_latent_solve_propagate_band_matches_default",
        "test_legacy_gain_hook_contract_matches_blocks_path",
        "test_lq_scan_superblocks_match_unrolled",
        "test_lq_banded_matches_dense",
        "test_fused_blocks_banded_matches_dense",
        "test_latent_solver_householder_step",
        "test_two_qr_routing_through_hook",
        "test_lq_factorization_hook_matches_fused_predict_update",
        "test_update_from_products_and_propagate_match_sqrt_tier",
        "test_factorization_hook_matches_fused_predict_update",
    },
}


def pytest_collection_modifyitems(items):
    for item in items:
        fname = os.path.basename(str(item.fspath))
        bare = item.name.split("[", 1)[0]
        if bare in _SLOW.get(fname, ()):
            item.add_marker(pytest.mark.slow)
