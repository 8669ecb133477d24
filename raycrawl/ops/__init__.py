"""Large-scale training-data operations over Ray Datasets.

Beyond the reference crawler's own operators (SURVEY.md §2), these are the
operations a 100 TB training-data pipeline needs: deduplication (exact,
MinHash+LSH, SimHash, n-gram Jaccard, embedding cosine), similarity search,
text analysis (language-ID, quality scoring, token stats, fingerprints),
stream-shaped windows, and multimodal column plumbing. All are expressed
Ray-Data-first: vectorized ``map_batches``, partial aggregation before
shuffles, broadcast small sides.
"""
