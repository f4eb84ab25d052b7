"""Sources: synthetic Common-Crawl-style corpus generator + CDX scan."""
