"""Physics operators: flux scans, convection, stencils, transmission."""
