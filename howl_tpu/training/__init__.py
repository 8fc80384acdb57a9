"""Training: objectives, train state, jitted steps, CLI entry points."""
