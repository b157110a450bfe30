"""Sources & sinks: web_pages corpus schema + readers/writers/exports."""
