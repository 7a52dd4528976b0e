"""Composable DataFrame operators (SURVEY.md §2).

Each module holds thin, pure functions DataFrame -> DataFrame; pipelines and
t2 queries compose them.  Nothing here collects to the driver.
"""
