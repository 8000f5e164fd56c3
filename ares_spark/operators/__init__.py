"""DataFrame-level operators: the Spark mapping of SURVEY.md §2A/§2B."""
