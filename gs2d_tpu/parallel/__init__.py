"""Multi-chip scale-out (new design; the reference is single-GPU —
SURVEY.md §2.5)."""
