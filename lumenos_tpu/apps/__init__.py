"""Demo applications: the PPD HTTP server/client pair (reference cmd/)."""
