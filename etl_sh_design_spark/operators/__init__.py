"""Reusable relational operators (SURVEY.md §2) — each a DataFrame ->
DataFrame transformation built from Catalyst-optimizable primitives;
`applyInPandas` only where semantics are inherently sequential (W4/W7)."""
