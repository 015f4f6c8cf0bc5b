"""Structured Streaming extension layer (NOT reference semantics —
SURVEY.md §2.9: the reference is batch-only; these are engine
extensions for the driver's stream-shaped `events` table)."""
