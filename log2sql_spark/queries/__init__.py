"""Driver-facing query registrations, one module per operator family."""
