"""Query plans: the median query suite (the reference's own surface) and the
relational suite (the operator categories the reference delegates to host
Impala — SURVEY §2.2 — expressed as Catalyst-optimized DataFrame plans)."""
