"""Control-plane: typed plan contracts, endpoint registry, validators,
deterministic planner and the pipeline orchestrator (reference
``LLM_Ingestor/`` — SURVEY.md §2.11)."""
