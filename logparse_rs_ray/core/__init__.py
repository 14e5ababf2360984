"""Pure, Ray-free semantic kernels (tokenizer, schema, hashing, anonymizer)."""
