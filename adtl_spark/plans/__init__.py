"""Plan construction: rule->Column compiler and table materializers."""
