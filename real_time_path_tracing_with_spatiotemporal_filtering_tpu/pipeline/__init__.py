"""Frame orchestration: history state, the fused frame function, renderer."""
