"""Pipeline stage operators — each a pure DataFrame → DataFrame function."""
