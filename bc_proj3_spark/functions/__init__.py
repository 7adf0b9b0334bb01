"""Column-level building blocks shared by plans, operators, pipeline."""
