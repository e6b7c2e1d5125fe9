"""Plan inspection & serving veneer."""
