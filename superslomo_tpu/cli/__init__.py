"""CLI entry points mirroring the reference's script surfaces
(scripts/main.py, evaluate_interpolation_results.py,
evaluate_optical_flow_results.py, visualize_interpolation.py)."""
