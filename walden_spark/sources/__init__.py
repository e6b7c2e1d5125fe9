"""Sources & sinks: file formats, config-driven registry, generator
catalogs (TPC-H/TPC-DS), Python DataSource connectors."""
