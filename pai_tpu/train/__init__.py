"""Functional training core: losses, optimizer/EMA states, jitted steps,
and the epoch loop."""
