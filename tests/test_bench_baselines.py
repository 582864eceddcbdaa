"""The implied-V100-budget table in bench.py (BASELINE.md protocol x the
reference's declared SLURM wall budgets).

Every vs_baseline ratio in BENCH_r*.json derives from these four constants
plus the DDM 23 h line, so the arithmetic is pinned here: protocol sizes
come from the reference scripts (file:line in bench.py's docstring), split
sizes from the published Atom3D dataset.
"""

import bench


def test_implied_rates_match_protocol_arithmetic():
    # QM9: 110k train x 1000 epochs inside 11:59:00
    assert bench.IMPLIED_V100["qm9_mol_per_sec"] == (
        110_000 * 1000 / (11 * 3600 + 59 * 60))
    assert round(bench.IMPLIED_V100["qm9_mol_per_sec"], 1) == 2549.8
    # MD17: 1000 train / batch 5 = 200 steps/epoch x 1000 epochs in 3:59:00
    assert round(bench.IMPLIED_V100["md17_ms_per_step"], 2) == 71.70
    # LBA: 3507 train x 300 epochs in 1:59:00
    assert round(bench.IMPLIED_V100["lba_complex_per_sec"], 1) == 147.4
    # LEP: 304 train x 300 epochs in 1:59:00
    assert round(bench.IMPLIED_V100["lep_pair_per_sec"], 2) == 12.77
    # DDM: 1M x 100 epochs in 23 h (the round-1 flagship constant)
    assert round(bench.BASELINE_MOLS_PER_SEC, 0) == round(1e8 / (23 * 3600), 0)


def test_ratios_are_upper_bounds_in_the_right_direction():
    """Throughput rows divide value/implied; the ms/step row divides
    implied/value — both so that bigger == faster than the reference."""
    # a hypothetical chip exactly at the V100 budget must read 1.0
    assert round(2550.1 / bench.IMPLIED_V100["qm9_mol_per_sec"], 2) == 1.0
    assert round(bench.IMPLIED_V100["md17_ms_per_step"] / 71.7, 2) == 1.0
