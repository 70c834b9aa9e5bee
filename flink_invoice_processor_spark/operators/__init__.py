"""Pure, batch-testable DataFrame transforms for the invoice dataflows."""
