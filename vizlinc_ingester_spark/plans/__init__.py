"""End-to-end pipeline plans (SURVEY.md §3)."""
