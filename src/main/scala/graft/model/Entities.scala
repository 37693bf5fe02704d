package graft.model

/** Typed schemas for the EVM + NFT domain, 1:1 with the reference's
  * frozen dataclasses (SURVEY.md §1.2).
  *
  * Scalar conventions (FIXTURES.md §A): addresses = lowercase 0x-hex
  * string(42); hashes = 0x-hex string(66); uint256 values = 64-char
  * zero-padded lowercase hex strings (the reference itself stores
  * token_id/quantity as hex in the sink, `dynamodb.py:624-626,651`, so
  * hex-string fidelity IS reference behavior; ordering on the padded
  * form is consistent with numeric ordering); timestamps = unix seconds.
  */
final case class EvmLog(
    removed: Boolean,
    log_index: Long,
    transaction_index: Long,
    transaction_hash: String,
    block_hash: String,
    block_number: Long,
    address: String, // nullable
    data: String, // 0x-hex ABI payload
    topics: Seq[String]) // topics(0) = event signature

// `evm/types.py:58-83`
final case class EvmBlock(
    number: Long,
    hash: String,
    parent_hash: String,
    timestamp: Long,
    miner: String,
    gas_limit: Long,
    gas_used: Long,
    size: Long,
    difficulty: String,
    transaction_hashes: Seq[String],
    uncles: Seq[String])

// `evm/types.py:37-55`; to_ == null => contract creation. v/r/s are the
// ECDSA signature triple the reference carries (`types.py:47-49`) —
// parsed and stored, never computed on: v = recovery id + chain
// offset (small int), r/s = 32-byte words as 0x-hex.
final case class EvmTransaction(
    block_hash: String,
    block_number: Long,
    from_ : String,
    to_ : Option[String],
    gas: Long,
    gas_price: Long,
    hash: String,
    input: String,
    nonce: Long,
    transaction_index: Long,
    value: String,
    v: Long,
    r: String,
    s: String)

// `evm/types.py:107-124`. logs_bloom (`types.py:116`) is the 2048-bit
// EVM logs bloom as 0x + 512 hex — the reference parses it without
// computing on it; here it additionally powers pre-explode topic
// pruning ([[graft.expr.Exprs.bloomMayContain]], no false negatives by
// the yellow-paper construction [[Bloom.logsBloom]]).
final case class EvmTransactionReceipt(
    transaction_hash: String,
    transaction_index: Long,
    block_hash: String,
    block_number: Long,
    from_ : String,
    to_ : Option[String],
    cumulative_gas_used: Long,
    gas_used: Long,
    contract_address: Option[String],
    status: Option[Long],
    logs: Seq[EvmLog],
    logs_bloom: String)

// `evm/rpc.py:150-196`: get_blocks with `full_transactions=True` — the
// inflated typed form the crawler consumes (field-by-field conversion of
// the RPC response), vs [[EvmBlock]]'s hash-list form. `transactions` is
// the nested full-object list; exploding it is the reference's
// block -> transaction fan-out (SURVEY G1).
final case class EvmBlockWithTxs(
    number: Long,
    hash: String,
    parent_hash: String,
    timestamp: Long,
    miner: String,
    gas_limit: Long,
    gas_used: Long,
    size: Long,
    difficulty: String,
    transactions: Seq[EvmTransaction],
    uncles: Seq[String])

// `nft/entities.py:18-31`
final case class Collection(
    blockchain: String,
    collection_id: String,
    creator: String,
    block_created: Long,
    specification: String, // "ERC-721" | "ERC-1155"
    date_created: Long,
    data_version: Int,
    owner: Option[String],
    name: Option[String],
    name_lower: Option[String], // lower(name)[:1024], `dynamodb.py:92-94`
    symbol: Option[String],
    total_supply: Option[String])

// `nft/entities.py:39-52`
final case class Token(
    blockchain: String,
    collection_id: String,
    token_id: String, // hex64
    mint_block: Long,
    mint_date: Long,
    quantity: String, // hex64
    attribute_version: String, // hex40 LWW ordering key
    original_owner: String,
    current_owner: Option[String], // null for ERC-1155
    metadata_url: Option[String])

// `nft/entities.py:63-80`
final case class TokenTransfer(
    blockchain: String,
    collection_id: String,
    token_id: String,
    collection_type: String,
    timestamp: Long,
    transaction_type: String, // mint | burn | transfer, `nft/entities.py:33-37`
    from_ : String,
    to_ : String,
    quantity: String, // hex64
    block_id: Long,
    transaction_hash: String,
    transaction_index: Long,
    log_index: Long,
    attribute_version: String, // hex40
    data_version: Int)

// `nft/entities.py:82-89`
final case class TokenOwner(
    blockchain: String,
    account: String,
    collection_id: String,
    token_id: String,
    quantity: String, // hex64, or "-" + hex64 when net-negative mid-replay
    data_version: Int)

// `nft/entities.py:54-61` — declared by the reference but written by no
// pipeline (the metadata CONTENT store the URI points at); modeled for
// schema parity so a downstream fetch-and-store job has its row type.
final case class TokenMetadata(
    blockchain: String,
    collection_id: String,
    token_id: String, // hex64
    content: String,
    content_type: String)

object Addresses {
  val Zero = "0x0000000000000000000000000000000000000000"
}
