"""Engine operators (SURVEY §2 inventory), each a pure DataFrame→DataFrame
transform so Catalyst sees one logical plan per pipeline, not per-row code."""
