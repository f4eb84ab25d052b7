"""Crawl-domain operators: seen-set, politeness, frontier, fetch,
best-capture ranking, dedupe, ANN similarity, scoring joins."""
