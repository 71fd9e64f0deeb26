"""Host orchestration: parse -> device transforms -> container (and back)."""
