"""North-star operators (SURVEY.md §7.1 M4)."""
