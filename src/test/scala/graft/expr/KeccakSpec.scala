package graft.expr

import org.scalatest.funsuite.AnyFunSuite

/** Vectors are the published Keccak-256 test values (keccak.team) and
  * the well-known Ethereum event signature hashes the reference embeds
  * (`evm/types.py:285-313`). */
class KeccakSpec extends AnyFunSuite {

  test("empty string") {
    assert(Keccak.hashHexOfUtf8("") ===
      "c5d2460186f7233c927e7db2dcc703c0e500b653ca82273b7bfad8045d85a470")
  }

  test("abc") {
    assert(Keccak.hashHexOfUtf8("abc") ===
      "4e03657aea45a94fc7d47ba826c8d667c0d1e6e33a64a036ec44f58fa12d6c45")
  }

  test("ERC-721 Transfer event topic") {
    assert(Derived.erc721 ===
      "0xddf252ad1be2c89b69c2b068fc378daa952ba7f163c4a11628f55a4df523b3ef")
  }

  test("ERC-1155 TransferSingle event topic") {
    // prefix/suffix cross-checked against the reference's fixture docs
    // (FIXTURES.md: "0xc3d58168…f62")
    assert(Derived.single ===
      "0xc3d58168c5ae7397731d063d5bbf3d657854427343f4c083240f7aacaa2d0f62")
  }

  test("ERC-1155 TransferBatch event topic") {
    assert(Derived.batch ===
      "0x4a39dc06d4c0dbc64b70af90fd698a233a518aa5d07e595d983b8c0526c8f7fb")
  }

  test("multi-block input (> 136-byte rate)") {
    val longMsg = "a" * 500
    // value computed by the same algorithm family; assert structural
    // properties + stability across calls
    val h1 = Keccak.hashHexOfUtf8(longMsg)
    val h2 = Keccak.hashHexOfUtf8(longMsg)
    assert(h1.length === 64 && h1 === h2)
    assert(h1 !== Keccak.hashHexOfUtf8(longMsg + "b"))
  }

  private object Derived {
    val erc721 = graft.nft.Derive.Erc721TransferSig
    val single = graft.nft.Derive.Erc1155TransferSingleSig
    val batch = graft.nft.Derive.Erc1155TransferBatchSig
  }
}
