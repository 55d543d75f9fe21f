"""Command-line entry points: training driver and progressive-codec demo."""
