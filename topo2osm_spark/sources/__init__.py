"""Sources & sinks: SOSI span tokenizer, fixture generator, warehouse."""
