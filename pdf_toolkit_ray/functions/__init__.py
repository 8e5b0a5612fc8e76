"""Pure extraction functions — the single source of truth shared verbatim
by the single-process oracle (tests) and the distributed Ray stages, so
per-turn text equality cannot diverge between them (SURVEY.md §7.5.1)."""
