"""Plans: the iterative crawl-loop driver and checkpoint/resume protocol."""
