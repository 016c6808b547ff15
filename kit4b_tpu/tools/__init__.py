"""Long-tail utility subprocesses (SURVEY.md §2.1/§2.4): SSR discovery,
SNP format converters, WIG utilities, loci remapping, ROI extraction —
thin transforms over the L3 IO layer, mirroring the reference's ~45
standalone mains over libkit4b."""
