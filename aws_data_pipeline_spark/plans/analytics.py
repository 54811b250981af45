"""Analytics plans (joins/windows/setops) — populated incrementally."""
