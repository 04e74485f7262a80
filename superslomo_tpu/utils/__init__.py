"""Utilities: .flo IO + flow visualization, image metrics, profiling."""
