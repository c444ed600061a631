from newsfeeds_crawler_spark.synth.corpus import CorpusSpec, SynthCorpus, synthesize

__all__ = ["CorpusSpec", "SynthCorpus", "synthesize"]
