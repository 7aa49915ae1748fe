"""In-process test/dev servers for exercising real remote-FS schemes."""
